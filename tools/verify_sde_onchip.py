"""On-chip verify: the round-3 SDE surface (adaptive, adaptive adjoint,
weak MC, events) through the PUBLIC API on the real TPU (f32), plus error
probes. Run with PYTHONPATH=/root/repo:/root/.axon_site; ~5-15 min cold
compiles, seconds warm. Works on CPU too (JAX_PLATFORMS=cpu) — the same
checks at f32.
"""
import time

import jax
import jax.numpy as jnp

import paddlexde_tpu as pxt
from paddlexde_tpu.brownian.api import BrownianInterval

print("devices:", jax.devices(), flush=True)
t_start = time.time()

mu, sigma = 0.7, 0.5
f = lambda t, y: mu * y
g = lambda t, y: sigma * y
y0 = jnp.array([1.0], dtype=jnp.float32)
bm = BrownianInterval(0.0, 1.0, size=(1,), key=jax.random.key(7), dtype=jnp.float32)
t = jnp.array([0.0, 1.0], dtype=jnp.float32)

# ---- 1. sdeint(adaptive=True) vs same-path closed form ----
sol, stats = pxt.sdeint(
    f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
    rtol=1e-4, atol=1e-6, options={"return_stats": True}, time_axis=0,
)
w1 = bm(0.0, 1.0)
closed = y0 * jnp.exp((mu - 0.5 * sigma**2) * 1.0 + sigma * w1)
err = float(jnp.abs(sol[-1] - closed)[0])
print(f"[1] adaptive milstein: status={int(stats.status)} "
      f"n_accept={int(stats.n_accept)} err_vs_closed={err:.2e}", flush=True)
assert int(stats.status) == 0
assert err < 5e-3, err

# ---- 2. sdeint_adjoint(adaptive=True): forward equality + gradient sanity ----
def loss_adj(y0v):
    ys = pxt.sdeint_adjoint(
        f, g, y0v, t, solver="milstein", bm=bm, adaptive=True,
        rtol=1e-3, atol=1e-5, time_axis=0,
    )
    return jnp.sum(ys[-1])

fwd_plain = pxt.sdeint(
    f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
    rtol=1e-3, atol=1e-5, time_axis=0,
)
fwd_adj_val, grad_y0 = jax.value_and_grad(loss_adj)(y0)
fwd_gap = float(jnp.abs(fwd_adj_val - jnp.sum(fwd_plain[-1])))
# GBM: dy(1)/dy0 = y(1)/y0 exactly (linear SDE), any path/any grid
grad_expect = float(fwd_adj_val / y0[0])
grad_rel = abs(float(grad_y0[0]) - grad_expect) / abs(grad_expect)
print(f"[2] adaptive adjoint: fwd_gap={fwd_gap:.2e} grad={float(grad_y0[0]):.6f} "
      f"expect={grad_expect:.6f} rel={grad_rel:.2e}", flush=True)
assert fwd_gap == 0.0, fwd_gap  # forward must be BIT-equal
assert grad_rel < 1e-5, grad_rel  # linearity: exact up to f32 accumulation

# ---- 3. sdeint_weak_mc: GBM mean E[y(1)] = exp(mu) ----
est = pxt.sdeint_weak_mc(
    f, g, jnp.float32(1.0), 1.0, solver="weak2",
    n_paths=4096, n_steps=8, key=jax.random.key(11),
)
truth = float(jnp.exp(jnp.float32(mu)))
w_err = abs(float(est.mean) - truth)
print(f"[3] weak MC: est={float(est.mean):.5f} truth={truth:.5f} "
      f"err={w_err:.2e} stderr={float(est.stderr):.2e}", flush=True)
assert w_err < 4.0 * float(est.stderr) + 5e-3, (w_err, float(est.stderr))

# ---- 4. sdeint_event: GBM first passage over a barrier ----
barrier = 1.3
ev = pxt.sdeint_event(
    f, g, y0, 0.0,
    lambda tt, yy: yy[0] - barrier,
    solver="milstein", t_max=4.0, step_size=1.0 / 64,
    key=jax.random.key(3),
)
y_gap = abs(float(ev.y_event[0]) - barrier)
print(f"[4] event: fired={bool(ev.event_fired)} t*={float(ev.t_event):.4f} "
      f"y*={float(ev.y_event[0]):.5f} gap={y_gap:.2e} status={int(ev.status)}",
      flush=True)
assert bool(ev.event_fired)
assert int(ev.status) == 0
assert y_gap < 5e-3, y_gap

# ---- 5. error probes ----
try:
    pxt.sdeint(f, g, y0, t, solver="milstein", bm=bm, adaptive=True,
               options={"bogus_knob": 1}, time_axis=0)
    raise SystemExit("FAIL: unknown adaptive option key accepted")
except (ValueError, TypeError) as e:
    print(f"[5a] unknown adaptive option -> {type(e).__name__}: "
          f"{str(e)[:80]}", flush=True)

try:
    pxt.sdeint_event(f, g, y0, 0.0, lambda tt, yy: yy[0] - barrier,
                     solver="dopri5", t_max=1.0, step_size=0.1)
    raise SystemExit("FAIL: bad event solver accepted")
except ValueError as e:
    print(f"[5b] bad event solver -> ValueError: {str(e)[:80]}", flush=True)

try:
    pxt.sdeint_weak_mc(f, g, jnp.float32(1.0), 1.0, solver="nope",
                       n_paths=8, n_steps=2)
    raise SystemExit("FAIL: bad weak solver accepted")
except ValueError as e:
    print(f"[5c] bad weak solver -> ValueError: {str(e)[:80]}", flush=True)

# ---- 6. round-4 registry + joint-triple path: taylor15_general with
# triple_mode='fourier' (one joint (W,U,A,J3) query per step) on a
# non-commuting 2-channel linear system; finite + registry knob plumbing ----
import numpy as _np

_rngp = _np.random.RandomState(1)
_b1 = jnp.asarray(_rngp.randn(3, 3) * 0.3, jnp.float32)
_b2 = jnp.asarray(_rngp.randn(3, 3) * 0.3, jnp.float32)
_gm = lambda tt, yy: jnp.stack([yy @ _b1.T, yy @ _b2.T], axis=-1)
_fm = lambda tt, yy: -0.4 * yy
_y0m = jnp.asarray(_rngp.randn(16, 3), jnp.float32)
_bmf = BrownianInterval(0.0, 0.5, size=(16, 2), key=jax.random.key(9),
                        dtype=jnp.float32, levy_area_approximation="fourier",
                        levy_fourier_terms=4)
_ts = jnp.linspace(0.0, 0.5, 9)
_sol_f = pxt.sdeint(_fm, _gm, _y0m, _ts, "taylor15_general", bm=_bmf,
                    noise_dim=2, time_axis=0,
                    options={"triple_mode": "fourier"})
_sol_z = pxt.sdeint(_fm, _gm, _y0m, _ts, "taylor15_general", bm=_bmf,
                    noise_dim=2, time_axis=0)
assert bool(jnp.all(jnp.isfinite(_sol_f))), "fourier-triple solve not finite"
_diff = float(jnp.max(jnp.abs(_sol_f - _sol_z)))
assert _diff > 0.0, "triple_mode='fourier' did not change the integrals"
print(f"[6] taylor15_general fourier-triple on-chip: finite, "
      f"max|fourier-zerolie|={_diff:.2e}", flush=True)

try:
    pxt.sdeint(_fm, _gm, _y0m, _ts, "taylor15_general", key=3, noise_dim=2,
               time_axis=0, levy_area_approximation="davie",
               options={"triple_mode": "fourier"})
    raise SystemExit("FAIL: fourier triple accepted a davie bm")
except ValueError as e:
    print(f"[6b] fourier triple on davie bm -> ValueError: {str(e)[:80]}",
          flush=True)

print(f"ALL VERIFY CHECKS PASSED in {time.time() - t_start:.1f}s", flush=True)
