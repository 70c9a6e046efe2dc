"""Corpus-calibration probe: is the largevocab glyph rendering learnable
AT ALL, independent of the VQA tower? [ROADMAP r5; supports the
AD-head study, VERDICT r4 #1]

Renders single-site crops through the exact corpus pipeline (site blob,
bg, jitters, sensor noise, JPEG roundtrip) and trains a small CNN to
classify the 45 attribute conjunctions directly — no VQA tower, no
question routing. If this fails, the rendering is the blocker; if it
succeeds, the VQA model/optimization is.

Measured (r5, CPU): val 0.98 by epoch 29 with 4096 crops — the corpus
carries the signal; the probe's 8 px effective cells (stride-8 CNN on a
40 px crop) vs resnet_small's 16 px cells motivated resnet_xsmall.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python benchmarks/glyph_probe.py
"""
import io
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from btia_tpu.data import synthetic as S

SHAPES, SIZES, INTS = S._ATTR_SHAPES, S._ATTR_SIZES, S._ATTR_INTENSITIES


def render_crop(rng, shape, size_word, intensity, crop=40):
    size = 128
    modality = S._MODALITIES[rng.randint(len(S._MODALITIES))]
    bg = S._MODALITY_BG[modality] + rng.randn() * 6
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    img = np.full((size, size), bg, np.float32)
    img += (x / size - 0.5) * rng.randn() * 8
    target = 255.0 if bg > 128 else 0.0
    cx = (0.5 + rng.uniform(-0.02, 0.02)) * size
    cy = (0.5 + rng.uniform(-0.02, 0.02)) * size
    site_r = size * (0.11 + rng.uniform(-0.01, 0.01))
    d2s = ((x - cx) / site_r) ** 2 + ((y - cy) / site_r) ** 2
    delta = -70.0 if bg > 128 else 70.0
    img += delta * np.exp(-d2s / 2.0)
    r = S._ATTR_SIZE_PX[size_word] * rng.uniform(0.92, 1.08)
    gx = cx + rng.uniform(-0.06, 0.06) * site_r
    gy = cy + rng.uniform(-0.06, 0.06) * site_r
    w = S._glyph_mask(x, y, gx, gy, shape, r, max_len=14.0)
    alpha = S._ATTR_INTENSITY_FRAC[intensity]
    img = img * (1 - w * alpha) + target * w * alpha
    img += rng.randn(size, size) * 4
    g = np.clip(img, 0, 255).astype(np.uint8)
    # JPEG roundtrip as the corpus does (quality=92)
    buf = io.BytesIO()
    Image.fromarray(g).save(buf, format="JPEG", quality=92)
    g = np.asarray(Image.open(buf))
    c0 = 64 - crop // 2
    return g[c0 : c0 + crop, c0 : c0 + crop].astype(np.float32) / 255.0


def make_ds(n, seed):
    rng = np.random.RandomState(seed)
    xs = np.zeros((n, 40, 40, 1), np.float32)
    ys = np.zeros((n,), np.int32)
    for i in range(n):
        si = rng.randint(5)
        zi = rng.randint(3)
        ii = rng.randint(3)
        xs[i, :, :, 0] = render_crop(rng, SHAPES[si], SIZES[zi], INTS[ii])
        ys[i] = (si * 3 + zi) * 3 + ii
    return xs, ys


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    ntr, nva = 4096, 1024
    xtr, ytr = make_ds(ntr, 0)
    xva, yva = make_ds(nva, 1)
    print("data ready", flush=True)

    class CNN(nn.Module):
        @nn.compact
        def __call__(self, x):
            for f in (32, 64, 128):
                x = nn.Conv(f, (3, 3), strides=(2, 2))(x)
                x = nn.relu(x)
                x = nn.Conv(f, (3, 3))(x)
                x = nn.relu(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(45)(x)

    model = CNN()
    params = model.init(jax.random.PRNGKey(0), xtr[:2])
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb):
        def loss_fn(p):
            lg = model.apply(p, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                lg, yb
            ).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    @jax.jit
    def acc(params, xb, yb):
        return (model.apply(params, xb).argmax(-1) == yb).mean()

    bs = 128
    rng = np.random.RandomState(2)
    for ep in range(30):
        perm = rng.permutation(ntr)
        tot = 0.0
        for i in range(0, ntr, bs):
            idx = perm[i : i + bs]
            params, opt, l = step(params, opt, xtr[idx], ytr[idx])
            tot += float(l)
        va = float(acc(params, xva, yva))
        ta = float(acc(params, xtr[:1024], ytr[:1024]))
        print(
            f"ep {ep}: loss {tot / (ntr // bs):.3f} train {ta:.3f} val {va:.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
