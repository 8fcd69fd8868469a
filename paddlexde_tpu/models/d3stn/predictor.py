"""Standalone D3STN inference: checkpoint -> jitted fixed-shape forecaster.

The reference serves predictions through the full Trainer (its test loop,
``example/D3STN/train_dde.py:608-660`` in DrownFish19/PaddleXDE) — there is no
deployment path that doesn't drag in the optimizer, datasets and logging.
This module is the production counterpart: load the trainer's file-per-part
checkpoint (``epoch_*.params`` pickle + ``.enidx/.deidx`` lag npys), build the
model once, AOT-compile ONE program shape, and serve ``[B, N, his_len, 3]``
histories as de-scaled ``[B, N, tgt_len]`` forecasts. Ragged batches are
zero-padded to the compiled batch size (static shapes — no recompiles in the
serving loop; XLA traces once).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...functional.ddeint import ddeint
from ...xde.history import history_index
from .config import D3STNConfig
from .graph import norm_adj_matrix
from .model import D3STN

__all__ = ["Predictor"]


class Predictor:
    """Jitted fixed-shape D3STN forecaster.

    Args:
        cfg: model config (must match the checkpoint).
        params: flax param tree.
        enc_idx / dec_idx: learned lag tensors ``[tgt_len]``.
        adj_matrix / sc_matrix: RAW adjacencies (normalized here, same as the
            Trainer).
        scaler: optional object with ``inverse_transform`` (e.g. the dataset's
            ScalerMinMax) applied to the value channel of the output; None
            returns model-space values.
        batch_size: the compiled batch size; smaller inputs are zero-padded,
            larger ones are processed in chunks.
    """

    def __init__(self, cfg: D3STNConfig, params, enc_idx, dec_idx,
                 adj_matrix, sc_matrix, scaler=None, batch_size: int = 32):
        self.cfg = cfg
        self.scaler = scaler
        self.batch_size = int(batch_size)
        self.model = D3STN(
            cfg,
            jnp.asarray(norm_adj_matrix(np.asarray(adj_matrix)).astype(np.float32)),
            jnp.asarray(norm_adj_matrix(np.asarray(sc_matrix)).astype(np.float32)),
        )
        self.state = {
            "net": jax.tree.map(jnp.asarray, params),
            "enc_idx": jnp.asarray(enc_idx),
            "dec_idx": jnp.asarray(dec_idx),
        }
        self.his_span = jnp.arange(cfg.his_len, dtype=jnp.float32)

        def forward(state, src):
            y0 = history_index(
                state["dec_idx"], src, self.his_span, interpolation="cubic"
            )
            func = lambda y_lags, y: self.model.apply(
                {"params": state["net"]}, y_lags, y, deterministic=True
            )
            sol, _ = ddeint(
                func, y0, jnp.arange(2.0, dtype=jnp.float32), state["enc_idx"],
                src, self.his_span, cfg.solver, fixed_solver_interp="",
                time_axis=0,
            )
            return sol[1][..., 0]  # [B, N, tgt_len]

        self._forward = jax.jit(forward)

        def forward_idx(state, series, s_b):
            # device-resident bulk path: ``series`` [N, T, C] lives on device
            # and each sample is ONE contiguous his_len slice (bit-identical
            # to the host path's series[:, s : s + his_len]) — stride-1
            # backtests otherwise re-ship the series ~his_len times over the
            # host link (the trainer's device_gather rationale, measured 77x
            # at PEMS08 scale on a ~25 MB/s dev tunnel).
            def one(s):
                return jax.lax.dynamic_slice_in_dim(
                    series, s, cfg.his_len, axis=1
                )

            return forward(state, jax.vmap(one)(s_b))

        self._forward_idx = jax.jit(forward_idx)
        self._series_dev = None  # predict_series upload cache (id-keyed)
        self._series_src = None

    # ------------------------------------------------------------------ load
    @classmethod
    def from_checkpoint(cls, cfg: D3STNConfig, ckpt_dir: str, adj_matrix,
                        sc_matrix, *, epoch: Optional[int] = None,
                        scaler=None, batch_size: int = 32) -> "Predictor":
        """Load the Trainer's checkpoint layout from ``ckpt_dir``
        (``epoch_best`` by default, or a specific ``epoch``)."""
        tag = f"epoch_{epoch}" if epoch is not None else "epoch_best"
        pf = os.path.join(ckpt_dir, f"{tag}.params")
        if not os.path.exists(pf):
            raise FileNotFoundError(
                f"{pf} not found — expected the Trainer's file-per-part "
                f"layout (epoch_*.params / .enidx.npy / .deidx.npy)"
            )
        with open(pf, "rb") as f:
            params = pickle.load(f)
        enc = np.load(os.path.join(ckpt_dir, f"{tag}.enidx.npy"))
        dec = np.load(os.path.join(ckpt_dir, f"{tag}.deidx.npy"))
        return cls(cfg, params, enc, dec, adj_matrix, sc_matrix,
                   scaler=scaler, batch_size=batch_size)

    # ----------------------------------------------------------------- serve
    def warmup(self):
        """Force the one compile outside the serving path."""
        dummy = np.zeros(
            (self.batch_size, self.cfg.num_nodes, self.cfg.his_len, 3),
            np.float32,
        )
        np.asarray(self._forward(self.state, jnp.asarray(dummy)))
        return self

    def predict_series(self, series: np.ndarray, starts) -> np.ndarray:
        """Bulk backtesting over a resident series: one upload, index batches.

        Args:
            series: the full transformed series ``[N, T, C]`` (the dataset's
                ``.data`` layout — scaled value + dow + tod channels).
            starts: window start indices ``[K]``; window ``k`` is
                ``series[:, starts[k] : starts[k] + his_len]``.

        Returns forecasts ``[K, N, tgt_len]`` (de-scaled when a scaler was
        given). Equals ``self(windows)`` on the host-gathered windows bit-for-
        bit; only the transfer pattern differs (``4*K`` bytes of indices per
        batch instead of ``K * N * his_len * C * 4``).

        The device copy is cached by the IDENTITY of the passed array (repeat
        calls with the same float32-contiguous array skip the upload); pass a
        fresh array after mutating a series in place.
        """
        series = np.ascontiguousarray(series, np.float32)
        n, t, c = series.shape
        cfg = self.cfg
        if (n, c) != (cfg.num_nodes, 3):
            raise ValueError(
                f"series shape {series.shape} does not match the compiled "
                f"({cfg.num_nodes}, *, 3)"
            )
        starts = np.asarray(starts, np.int32).reshape(-1)
        if starts.size and (starts.min() < 0 or starts.max() + cfg.his_len > t):
            raise ValueError(
                f"window starts [{starts.min()}, {starts.max()}] out of range "
                f"for his_len {cfg.his_len} over T={t}"
            )
        if self._series_src is not series or self._series_dev is None:
            self._series_dev = jnp.asarray(series)
            self._series_src = series
        outs = []
        for lo in range(0, starts.size, self.batch_size):
            chunk = starts[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.size
            if pad:  # ragged tail: repeat the last start (static shapes)
                chunk = np.concatenate([chunk, np.full(pad, chunk[-1], np.int32)])
            pred = np.asarray(
                self._forward_idx(self.state, self._series_dev, jnp.asarray(chunk))
            )
            outs.append(pred[: self.batch_size - pad])
        preds = (
            np.concatenate(outs, axis=0)
            if outs
            else np.zeros((0, cfg.num_nodes, cfg.tgt_len), np.float32)
        )
        if self.scaler is not None:
            preds = self.scaler.inverse_transform(preds[..., None])[..., 0]
        return preds

    def __call__(self, history: np.ndarray) -> np.ndarray:
        """``history [B, N, his_len, 3]`` (scaled value + dow + tod channels,
        the dataset's layout) -> forecasts ``[B, N, tgt_len]``."""
        history = np.asarray(history, np.float32)
        b, n, t, c = history.shape
        cfg = self.cfg
        if (n, t, c) != (cfg.num_nodes, cfg.his_len, 3):
            raise ValueError(
                f"history shape {history.shape} does not match the compiled "
                f"(*, {cfg.num_nodes}, {cfg.his_len}, 3)"
            )
        outs = []
        for lo in range(0, b, self.batch_size):
            chunk = history[lo : lo + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:  # ragged tail: zero-pad to the single compiled shape
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.float32)]
                )
            pred = np.asarray(self._forward(self.state, jnp.asarray(chunk)))
            outs.append(pred[: self.batch_size - pad])
        preds = np.concatenate(outs, axis=0)
        if self.scaler is not None:
            preds = self.scaler.inverse_transform(preds[..., None])[..., 0]
        return preds
