import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from die_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, jax.random as jr
from die_tpu.ops.mxu_gather import onehot_gather_multi
from die_tpu.ops.pallas_gather import pallas_onehot_gather

B, HW, N, T = 64, 65536, 65536, 16

def timed(f, *a, reps=3):
    r = f(*a); float(np.asarray(r))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); r = f(*a); float(np.asarray(r))
        best = min(best, time.perf_counter() - t0)
    return best

x = jnp.ones((8, 128), jnp.float32)
off = timed(jax.jit(lambda x: jnp.sum(x + 1.0)), x, reps=5)
print(json.dumps({"item": "off_ms", "v": round(off*1e3, 1)}), flush=True)

key = jr.PRNGKey(0)
fields = jr.uniform(key, (B, 2, HW), jnp.float32)
idx0 = jr.randint(jr.fold_in(key, 1), (B, N), 0, HW, jnp.int32)

def bench(tag, one_env):
    def run(fields, idx):
        def body(carry, t):
            ix = (idx + t) % HW
            out = jax.vmap(one_env)(fields, ix)
            return carry + jnp.sum(out), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(T))
        return acc
    b = (timed(jax.jit(run), fields, idx0) - off) / T
    macs = 2 * 4 * B * N * HW
    print(json.dumps({"item": tag, "ms": round(b*1e3, 2),
                      "tmacs_per_s": round(macs / b / 1e12, 1)}), flush=True)

def xla_env(pair, idx):
    gx, gy = onehot_gather_multi((pair[0], pair[1]), idx)
    return jnp.sum(gx) + jnp.sum(gy)

def pallas_env_c512(pair, idx):
    gx, gy = pallas_onehot_gather((pair[0], pair[1]), idx, chunk=512)
    return jnp.sum(gx) + jnp.sum(gy)

def pallas_env_c1024(pair, idx):
    gx, gy = pallas_onehot_gather((pair[0], pair[1]), idx, chunk=1024)
    return jnp.sum(gx) + jnp.sum(gy)

def pallas_env_c2048(pair, idx):
    gx, gy = pallas_onehot_gather((pair[0], pair[1]), idx, chunk=2048)
    return jnp.sum(gx) + jnp.sum(gy)

bench("xla_pair", xla_env)
for tag, fn in [("pallas_pair_c512", pallas_env_c512),
                ("pallas_pair_c1024", pallas_env_c1024),
                ("pallas_pair_c2048", pallas_env_c2048)]:
    try:
        bench(tag, fn)
    except Exception as e:
        print(json.dumps({"item": tag, "error": str(e)[:300]}), flush=True)
