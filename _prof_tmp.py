import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")
from btia_tpu.configs import get_config
from btia_tpu.models.model import build_model
cfg = get_config("streaming_vitl")
model = build_model(cfg.model)
B,Q,L = 16,128,32
ingest=336
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
variables = jax.jit(model.init, static_argnames=("train",))({"params": key, "dropout": key}, jnp.zeros((2,ingest,ingest,3),jnp.uint8), jnp.zeros((2,L),jnp.int32), train=False)
def serve(v, images, qids):
    t = model.apply(v, images, method="encode_image")
    return jax.lax.top_k(model.apply(v, t, qids, method="answer_questions"), 5)
fwd = jax.jit(serve)
imgs = rng.randint(0,255,(B,ingest,ingest,3)).astype(np.uint8)
qids = rng.randint(1,30000,(B,Q,L)).astype(np.int32)
o = fwd(variables, imgs, qids); np.asarray(o[0])
try:
    jax.profiler.start_trace("/tmp/btia_trace")
    o = fwd(variables, imgs, qids); np.asarray(o[0])
    jax.profiler.stop_trace()
    print("trace written", flush=True)
except Exception as e:
    print("profiler failed:", str(e)[:200], flush=True)
