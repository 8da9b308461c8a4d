"""Focused Bs sweep at tc=256 for the batch-tiled wide-row count."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from cobs_tpu.query.engine import _bucket, _count_csa

B, T, H = 64, 1000, 1
T_PAD = _bucket(T)
ROUNDS = 4
CONFIGS = [(19, 1536), (18, 3072), (17, 6144), (16, 12288), (15, 24576)]
BS = [1, 2, 4, 8, 16, 32, 64]
TC = 256

def make_btile(W, Bs):
    def btile(m, idxs):
        def body(c, idx):
            rows = idx[..., 0, 0]
            def per_sub(rs):
                chunks = jnp.moveaxis(rs.reshape(Bs, T_PAD // TC, TC), 1, 0)
                def cbody(acc, rc):
                    g = jnp.take(m, rc, axis=0)
                    return acc + _count_csa(g[:, :, None, :]), None
                acc0 = jnp.zeros((Bs, 1, W, 32), jnp.int32)
                out, _ = lax.scan(cbody, acc0, chunks)
                return out.reshape(Bs, W * 32).sum(axis=1)
            scores = lax.map(per_sub, rows.reshape(B // Bs, Bs, T_PAD))
            return c, scores.reshape(B)
        return lax.scan(body, 0, idxs)[1]
    return btile

def main():
    print(f"wide_tune2: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0xC0B5)
    setups = []
    for lg_sig, W in CONFIGS:
        sig = 1 << lg_sig
        k_small, k_large = 2, 2 + max(4, (16 * 384) // W)
        matrix = jax.jit(lambda k, s=sig, w=W: jax.random.bits(
            k, (s + 1, w), dtype=jnp.uint32).at[-1].set(0))(jax.random.key(lg_sig))
        jax.block_until_ready(matrix)
        def make(K, s=sig):
            return jnp.asarray(rng.integers(0, s, size=(K, B, T_PAD),
                dtype=np.int64).astype(np.int32)[..., None, None])
        idxs_s, idxs_l = make(k_small), make(k_large)
        fns = {}
        for Bs in BS:
            if (Bs * TC * W * 4) > (200 << 20):
                continue
            f = jax.jit(make_btile(W, Bs))
            np.asarray(f(matrix, idxs_s)); np.asarray(f(matrix, idxs_l))
            fns[f"Bs{Bs}"] = [f, float("inf"), float("inf")]
        setups.append(dict(W=W, matrix=matrix, idxs_s=idxs_s, idxs_l=idxs_l,
                           iters=k_large - k_small, fns=fns))
    for r in range(ROUNDS):
        for st in setups:
            for rec in st["fns"].values():
                f = rec[0]
                t0 = time.perf_counter(); np.asarray(f(st["matrix"], st["idxs_s"]))
                rec[1] = min(rec[1], time.perf_counter() - t0)
                t0 = time.perf_counter(); np.asarray(f(st["matrix"], st["idxs_l"]))
                rec[2] = min(rec[2], time.perf_counter() - t0)
        print(f"  round {r+1}/{ROUNDS} done", flush=True)
    for st in setups:
        line = f"W={st['W']:>6}:"
        for name, (f, bs, bl) in st["fns"].items():
            dt = max(bl - bs, 1e-9)
            gbps = st["iters"] * B * T_PAD * H * st["W"] * 4 / dt / 1e9
            line += f"  {name}={gbps:.0f}"
        print(line + "  GB/s")

if __name__ == "__main__":
    main()
