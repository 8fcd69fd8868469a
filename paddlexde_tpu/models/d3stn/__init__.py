from .config import D3STNConfig, load_config  # noqa: F401
from .dataset import ScalerMinMax, ScalerStd, TrafficFlowDataset, synthetic_traffic_npz  # noqa: F401
from .graph import (  # noqa: F401
    get_adjacency_matrix,
    get_adjacency_matrix_2direction,
    norm_adj_matrix,
    sym_norm_adj,
)
from .metrics import MAE, MAPE, MSE, RMSE, smis  # noqa: F401
from .model import D3STN, decoder_index  # noqa: F401
from .predictor import Predictor
from .trainer import Trainer, init_lag_anchors  # noqa: F401
from .train_utils import (  # noqa: F401
    EarlyStopping,
    Logger,
    cosine_annealing_with_warmup,
    kl_div,
    linear_annealing_with_warmup,
)
from .convert import convert_reference_state_dict  # noqa: F401
