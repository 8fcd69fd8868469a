"""D3STN configuration.

Same keys/defaults as the reference's argparse + JSON override
(``example/D3STN/args.py`` in DrownFish19/PaddleXDE), as a typed dataclass —
the reference's ``configs/*.json`` files load unchanged via :func:`load_config`.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

__all__ = ["D3STNConfig", "load_config"]


@dataclasses.dataclass
class D3STNConfig:
    # data
    dataset_name: str = "HZME_OUTFLOW"
    data_path: str = "TrafficFlowData/HZME_OUTFLOW/HZME_OUTFLOW.npz"
    adj_path: str = "TrafficFlowData/HZME_OUTFLOW/HZME_OUTFLOW.csv"
    sc_path: str = "TrafficFlowData/HZME_OUTFLOW/SCORR_HZME_OUTFLOW.npy"
    split: str = "6:2:2"
    scale: bool = True
    num_nodes: int = 80

    # model
    model_name: str = "D3STN"
    his_len: int = 288
    tgt_len: int = 12
    encoder_input_size: int = 1
    decoder_input_size: int = 1
    decoder_output_size: int = 1
    encoder_num_layers: int = 4
    decoder_num_layers: int = 4
    d_model: int = 128  # must equal d_proj + 2*d_sect + d_adaptive
    d_proj: int = 32
    d_sect: int = 32
    d_adaptive: int = 32
    attention: str = "Corr"  # "Corr" | "Vanilla"
    head: int = 8
    kernel_size: int = 3
    top_k: int = 5
    smooth_layer_num: int = 1
    with_adj: bool = True
    with_sc: bool = True
    solver: str = "euler"
    compute_dtype: str = "float32"  # "bfloat16" runs matmuls/convs on the MXU
    # in bf16 (params stay float32; softmax/layernorm/losses stay float32)
    conv_impl: str = "conv"  # "shifted_matmul": temporal convs as K time-
    # shifted [D,D] GEMMs (numerically identical, checkpoint-compatible)
    fuse_qkv: bool = False  # apply the q/k/v temporal convs as ONE conv with
    # 3x output features when input+padding agree. MEASURED SLOWER on v5e at
    # PEMS08 bs 32 (150.3 vs 138.4 ms — XLA's conv layout for 3x features
    # loses more than the op fusion saves); kept as a knob, default off
    gcn_impl: str = "auto"  # "auto": fused Pallas spatial-attention kernel on
    # TPU when dropout is inactive (the [B,T,N,N] score stays in VMEM —
    # ops/gcn_pallas.py); "xla" | "pallas" force a path. NB: score dropout
    # (dropout>0 in training) always takes the XLA path — an explicit
    # 'pallas' request then warns (the GCN kernel has no mask input; the
    # attention kernel does, see attn_impl)
    attn_impl: str = "auto"  # "auto": fused conv->MHA->conv Pallas kernel on
    # TPU (ops/attn_pallas.py — the attention blocks are ~2/3 of the step
    # under XLA); "xla" | "pallas" force a path. Attention-weight dropout
    # runs IN-kernel (round 3): the model samples one pre-scaled keep mask
    # per call and the kernel applies it fwd + bwd
    remat: bool = False  # jax.checkpoint each encoder/decoder layer: trades
    # recompute for peak-memory/spill (the step is remat/spill-bound at scale)
    spmd: bool = False  # wrap the Pallas kernels in their custom_partitioning
    # SPMD rule (ops/partition.py) so a multi-device mesh shards the batch
    # through them. Trainer(mesh=...) sets this automatically; default off
    # because the wrapper's custom-call boundary costs ~5% on a single chip
    # (measured 100.6 -> 105.8 ms, PEMS08 bs 32). Hand-rolled sharded jits
    # over the kernels must set it or the partitioner will replicate them.
    device_gather: str = "auto"  # resident-series batching: the full
    # transformed [N, T, C] series (~36 MB at PEMS08 scale) lives ON DEVICE
    # once and the jitted train/eval/test steps gather their [B, N, win, C]
    # windows with an in-jit dynamic_slice, so each batch ships 4*B bytes of
    # start indices instead of ~131 MB of stride-1-overlapping windows (the
    # host path re-sends the series ~1500x per epoch; at PEMS08 scale on the
    # dev tunnel that is ~97% of the 1724 s epoch). "auto": on when
    # single-process (incl. single-process meshes); "off": host-side gather +
    # upload (the reference's DataLoader shape, train_dde.py:96-114); "on":
    # force — rejected under multi-process runs, whose data sharding is
    # per-process host-fed by design.

    # train
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    start_epoch: int = 0
    train_epochs: int = 100
    warmup_step: int = 10
    decay_step: int = 30
    finetune_epochs: int = 50
    batch_size: int = 16
    patience: int = 15
    loss: str = "mse"  # "mae" | "mse" | "huber"
    kl_loss_weight: float = 1.0
    dropout: float = 0.0
    continue_training: bool = False
    finetune_fresh_schedule: bool = False  # restart the cosine warmup/decay
    # schedule at the finetune phase boundary. Default False = reference
    # parity: the reference REBUILDS its scheduler in _init_finetune
    # (train_dde.py:270-304) but then steps it to the GLOBAL epoch
    # (train_dde.py:363), so past warmup+decay the finetune lag LR sits at
    # the 0.1x floor — with Adam-normalized steps that caps lag movement at
    # ~0.03 index-steps/epoch, too cold to traverse a perturbed init
    # (measured: tools/dress_rehearsal.py round 4). True restarts the
    # schedule from the phase boundary so lags train at the advertised
    # full rate.
    distribute: bool = False
    seed: int = 0
    save_dir: str = "experiments"

    def __post_init__(self):
        expect = self.d_proj + 2 * self.d_sect + self.d_adaptive
        if self.d_model != expect:
            raise ValueError(
                f"d_model ({self.d_model}) must equal d_proj + 2*d_sect + "
                f"d_adaptive ({expect}) — the embedding concat feeds d_model"
            )
        for field, allowed in (
            ("conv_impl", ("conv", "shifted_matmul")),
            ("gcn_impl", ("auto", "xla", "pallas")),
            ("attn_impl", ("auto", "xla", "pallas")),
            ("attention", ("Corr", "Vanilla")),
            ("device_gather", ("auto", "on", "off")),
        ):
            val = getattr(self, field)
            if val not in allowed:
                raise ValueError(
                    f"{field}={val!r} not in {allowed} (a typo here would "
                    "silently fall back to a default implementation)"
                )


def load_config(json_path: Optional[str] = None, **overrides) -> D3STNConfig:
    """Build a config, optionally overriding from a reference-format JSON."""
    values = {}
    if json_path:
        with open(json_path) as f:
            values.update(json.load(f))
    values.update(overrides)
    known = {f.name for f in dataclasses.fields(D3STNConfig)}
    values = {k: v for k, v in values.items() if k in known}
    for key in ("scale", "with_adj", "with_sc", "continue_training", "distribute"):
        if key in values:
            values[key] = bool(values[key])
    return D3STNConfig(**values)
