import time, jax, jax.numpy as jnp, functools
import numpy as np

R = 262144
T = 36
key = jax.random.PRNGKey(0)
idx = jax.random.randint(key, (R,), 0, T)
tab3 = jax.random.uniform(key, (T, 3))
tab1 = tab3[:, 0]

def timeit(f, *a, n=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

@jax.jit
def row_gather(idx):
    return tab3[idx]

@jax.jit
def col_gathers(idx):
    return tab3[idx, 0], tab3[idx, 1], tab3[idx, 2]

@jax.jit
def flat_gathers(idx):
    return tab1[idx], tab1[idx], tab1[idx]

@jax.jit
def onehot_matmul(idx):
    oh = jax.nn.one_hot(idx, T, dtype=jnp.float32)  # (R, T)
    return oh @ tab3                                  # (R, 3)

print("row_gather (R,3):", timeit(row_gather, idx), "ms")
print("3x col gather tab3[idx,k]:", timeit(col_gathers, idx), "ms")
print("3x flat gather tab1[idx]:", timeit(flat_gathers, idx), "ms")
print("one-hot matmul:", timeit(onehot_matmul, idx), "ms")

# concat cost
a = jax.random.uniform(key, (R,))
@jax.jit
def cat(a):
    return jnp.concatenate([a, a])
print("concat 2x(R,):", timeit(cat, a), "ms")

# fold_in vmap cost
pid = jnp.arange(R, dtype=jnp.int32)
@jax.jit
def fold(pid):
    return jax.random.key_data(jax.vmap(lambda t: jax.random.fold_in(key, t))(pid))
print("vmap fold_in:", timeit(fold, pid), "ms")

@jax.jit
def unif(k):
    return jax.random.uniform(k, (5, R))
print("uniform (5,R):", timeit(unif, key), "ms")
