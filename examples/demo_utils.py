"""Shared demo harness.

Rebuild of ``example/demo_utils.py`` (DrownFish19/PaddleXDE): argparse flags,
the precomputed-spiral sliding-window dataset, a running-average meter, and
(optionally, when matplotlib is present) the 3-panel trajectory/phase/vector-
field visualization (``demo_utils.py:69-133``).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def demo_args(**overrides):
    p = argparse.ArgumentParser()
    p.add_argument("--solver", type=str, default=overrides.get("solver", "rk4"))
    p.add_argument("--data_len", type=int, default=1000)
    p.add_argument("--pred_len", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_steps", type=int, default=overrides.get("max_steps", 400))
    p.add_argument("--his_len", type=int, default=288)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--viz", action="store_true")
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args, _ = p.parse_known_args()
    return args


def make_spiral(data_len=1000, t_end=25.0, y0=(2.0, 0.0)):
    """True spiral data from dy/dt = y^3 @ A (reference ``demo_utils.py:156-164``)."""
    from paddlexde_tpu import RK4, odeint

    a_mat = jnp.asarray([[-0.1, 2.0], [-2.0, -0.1]])
    t = jnp.linspace(0.0, t_end, data_len)
    true_y = odeint(
        lambda tt, y: (y**3) @ a_mat, jnp.asarray([list(y0)]), t, RK4, time_axis=0
    )
    return t, true_y  # [T, 1, 2]


class WindowDataset:
    """Sliding windows over the precomputed trajectory
    (reference ``SimpleDemoData``, ``demo_utils.py:147-176``)."""

    def __init__(self, true_y, t, pred_len, seed=0):
        self.true_y = np.asarray(true_y)
        self.t = np.asarray(t)
        self.pred_len = pred_len
        self.rng = np.random.RandomState(seed)
        self.max_start = self.true_y.shape[0] - pred_len

    def batch(self, batch_size):
        idx = self.rng.randint(0, self.max_start, batch_size)
        y0 = jnp.asarray(self.true_y[idx])  # [B, 1, 2]
        targ = jnp.asarray(
            np.stack([self.true_y[i : i + self.pred_len] for i in idx], 1)
        )  # [pred_len, B, 1, 2]
        tb = jnp.asarray(self.t[: self.pred_len])
        return y0, tb, targ


class RunningAverageMeter:
    """Reference ``demo_utils.py:179-195``."""

    def __init__(self, momentum=0.99):
        self.momentum = momentum
        self.val = None
        self.avg = 0.0

    def update(self, val):
        self.avg = val if self.val is None else self.avg * self.momentum + val * (
            1 - self.momentum
        )
        self.val = val


def maybe_visualize(args, step, t, true_y, pred_y, vector_field, out_dir="png"):
    if not args.viz:
        return
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    ty, py = np.asarray(true_y)[:, 0], np.asarray(pred_y)[:, 0]
    axes[0].plot(np.asarray(t), ty[:, 0], "g-", label="true x")
    axes[0].plot(np.asarray(t)[: len(py)], py[:, 0], "b--", label="pred x")
    axes[0].set_title("trajectories")
    axes[0].legend()
    axes[1].plot(ty[:, 0], ty[:, 1], "g-")
    axes[1].plot(py[:, 0], py[:, 1], "b--")
    axes[1].set_title("phase portrait")
    xg, ygr = np.meshgrid(np.linspace(-2, 2, 21), np.linspace(-2, 2, 21))
    pts = jnp.asarray(np.stack([xg.ravel(), ygr.ravel()], -1), jnp.float32)
    dy = np.asarray(vector_field(pts))
    mag = np.linalg.norm(dy, axis=-1, keepdims=True)
    dy = dy / np.maximum(mag, 1e-8)
    axes[2].streamplot(xg, ygr, dy[:, 0].reshape(xg.shape), dy[:, 1].reshape(xg.shape))
    axes[2].set_title("learned vector field")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, f"{step:05d}.png"), dpi=80)
    plt.close(fig)


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def elapsed(self):
        return time.time() - self.t0
