import time, numpy as np, jax, jax.numpy as jnp
from ubpl_tpu.config import Config
from ubpl_tpu.train.common import make_view
from ubpl_tpu.models import create_pose_model, init_model

B = 32
cfg = Config(compute_dtype="bfloat16")
cfg.inp_res, cfg.out_res, cfg.kps_count = 256, 64, 9
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0,256,(B,256,256,3),dtype=np.uint8))
kps = jnp.asarray(np.concatenate([rng.uniform(20,230,(B,9,2)), np.ones((B,9,1))],-1).astype(np.float32))
means = jnp.zeros(3)

view_fn = jax.jit(lambda key: make_view(key, imgs, kps, means, cfg, augment=True))
v = view_fn(jax.random.PRNGKey(0)); jax.block_until_ready(v)
t0=time.perf_counter()
for i in range(20): v = view_fn(jax.random.PRNGKey(i))
jax.block_until_ready(v); t_view=(time.perf_counter()-t0)/20
print(f"make_view (aug+synth) bs{B}: {t_view*1e3:.1f} ms")

model = create_pose_model("HG3", 9, "AvgPool", dtype=jnp.bfloat16)
params, bstats = init_model(model, jax.random.PRNGKey(0), jnp.zeros((1,256,256,3)))
x = v.images
fwd = jax.jit(lambda p, b, x: model.apply({"params":p,"batch_stats":b}, x, train=True, mutable=["batch_stats"]))
out = fwd(params,bstats,x); jax.block_until_ready(out)
t0=time.perf_counter()
for _ in range(10): out = fwd(params,bstats,x)
jax.block_until_ready(out); t_fwd=(time.perf_counter()-t0)/10
print(f"HG3 forward bs{B}: {t_fwd*1e3:.1f} ms")

def loss_fn(p, b, x):
    (preds, feats), mut = model.apply({"params":p,"batch_stats":b}, x, train=True, mutable=["batch_stats"])
    return jnp.sum(preds.astype(jnp.float32)**2)
g = jax.jit(jax.grad(loss_fn))
gg = g(params,bstats,x); jax.block_until_ready(gg)
t0=time.perf_counter()
for _ in range(10): gg = g(params,bstats,x)
jax.block_until_ready(gg); t_bwd=(time.perf_counter()-t0)/10
print(f"HG3 fwd+bwd bs{B}: {t_bwd*1e3:.1f} ms")
