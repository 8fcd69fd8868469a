"""On-chip drive of the round-3 drift-implicit additive ladder + Chen triples.

Runs on the real TPU (f32): implicit_sra1 / implicit_foster2 accuracy vs the
explicit siblings on the SAME tree path, the stiff contraction explicit
schemes fail, the Chen-composed triple-integral law moment, and the loud
theta rejection. Usage:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_implicit_additive_onchip.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

import paddlexde_tpu as pxt
from paddlexde_tpu.functional.sdeint import _chen_levels, _levy_triple_integrals

print("devices:", jax.devices(), flush=True)

# --- accuracy on the same (W, I10, K) path, f32, near-exact OU oracle ------
theta, sigma = 1.2, 0.7
N = 256
y0 = jnp.ones((N,), jnp.float32)
key = jax.random.key(5)


def make_bm():
    return pxt.BrownianInterval(0.0, 1.0, size=(N,), key=key,
                                dtype=jnp.float32,
                                levy_area_approximation="space-time-time")


bm = make_bm()
ts_ref = np.linspace(0.0, 1.0, 513, dtype=np.float32)
dt = float(ts_ref[1] - ts_ref[0])


@jax.jit
def oracle():
    def ref_step(y, t):
        w, u, k = bm(t, t + dt, return_U=True, return_K=True)
        conv = w - theta * (u - theta * k)
        return jnp.exp(-theta * dt) * y + sigma * conv, None

    ref, _ = jax.lax.scan(ref_step, y0, jnp.asarray(ts_ref[:-1]))
    return ref


t0 = time.time()
ref = jax.block_until_ready(oracle())
print(f"oracle: {time.time()-t0:.1f}s", flush=True)

f = lambda t, y: -theta * y
g = lambda t, y: sigma * jnp.ones_like(y)


def err(method, n=17):
    ts = jnp.linspace(0.0, 1.0, n)
    t0 = time.time()
    sol = pxt.sdeint(f, g, y0, ts, method, bm=make_bm(), time_axis=0)
    e = float(jnp.mean(jnp.abs(sol[-1] - ref)))
    print(f"  {method:18s} err@{n}={e:.3e}  ({time.time()-t0:.1f}s)", flush=True)
    return e

print("strong accuracy (f32, same-path OU oracle):", flush=True)
e_sra = err("sra1")
e_isra = err("implicit_sra1")
e_fo = err("foster2")
e_ifo = err("implicit_foster2")
assert e_isra < e_sra, (e_isra, e_sra)
assert e_ifo < e_fo, (e_ifo, e_fo)

# --- stiff contraction at theta*h = 10 --------------------------------------
# NB the bm domain must cover the span: queries beyond t1 CLIP to the
# boundary (tree contract), which turns the (w, u, k) triple inconsistent —
# the first draft of this script reused the [0, 1] bm here and measured a
# bogus O(1) stationary m2 from the resulting fixed forcing.
th_s = 100.0
ts_s = jnp.linspace(0.0, 6.4, 65)  # h = 0.1
fs = lambda t, y: -th_s * y
y0s = 5.0 * jnp.ones((N,), jnp.float32)


def make_bm_stiff():
    return pxt.BrownianInterval(0.0, 6.4, size=(N,), key=key,
                                dtype=jnp.float32,
                                levy_area_approximation="space-time-time")


def m2(method):
    sol = pxt.sdeint(fs, g, y0s, ts_s, method, bm=make_bm_stiff(),
                     time_axis=0)
    return float(jnp.mean(sol[-1] ** 2))


m2_exp = m2("sra1")
m2_imp = m2("implicit_sra1")
m2_ifo = m2("implicit_foster2")
print(f"stiff m2: sra1={m2_exp:.3e} implicit_sra1={m2_imp:.3e} "
      f"implicit_foster2={m2_ifo:.3e} (target {sigma**2/(2*th_s):.2e})",
      flush=True)
assert not np.isfinite(m2_exp) or m2_exp > 1e10, m2_exp
assert np.isfinite(m2_imp) and m2_imp < 1.0, m2_imp
assert np.isfinite(m2_ifo) and m2_ifo < 1.0, m2_ifo

# --- Chen triple law moment on-chip (f32) ------------------------------------
M = 2
bm_a = pxt.BrownianInterval(0.0, 0.25, size=(1 << 14, M),
                            key=jax.random.key(7), dtype=jnp.float32,
                            levy_area_approximation="fourier")


@jax.jit
def chen_moment():
    w, a, j3 = _chen_levels(bm_a, 0.0, 0.25, 4)
    _, u = bm_a(0.0, 0.25, return_U=True)
    i3 = _levy_triple_integrals(w, u, a, jnp.float32(0.25), j3)
    return jnp.mean(i3[..., 0, 1, 0] ** 2)


m010 = float(chen_moment()) / (0.25**3 / 6.0)
print(f"chen k=4 E[I3(010)^2]/exact = {m010:.3f}", flush=True)
assert 0.85 < m010 < 1.15, m010

# --- loud error probes (host-side, no compile) -------------------------------
try:
    pxt.sdeint(f, g, y0, jnp.linspace(0, 1, 5), "implicit_sra1",
               bm=make_bm(), time_axis=0, options={"theta": 0.5})
    raise SystemExit("theta should have been rejected")
except ValueError as e:
    assert "theta" in str(e)
    print("theta rejection: OK", flush=True)

print("ALL ON-CHIP CHECKS PASSED", flush=True)
