"""Device-side procedural image synthesis for in-distribution benchmarks.

The serving/recall benches need image corpora whose CNN features have a
realistic distribution (sparse, non-negative, anisotropic fc7
activations) — random-noise JPEGs yield wildly out-of-distribution
features (~0.03 candidates per probed cell vs ~5 in-distribution, the
r04 serving-bench artifact), and no real image dataset is reachable from
this offline box. Each rendered image combines a low-frequency color
field, sinusoidal gratings with random orientation/frequency/phase,
gaussian blobs, and (optionally) pixel noise — structured enough to
drive meaningful conv activations, parameterized enough that features
cluster the way photo corpora do.

This plays the role of the reference's benchmark datasets (Caltech101 /
LFW pulled by the all-in-one stack, reference:
setup/all-in-one/README.md:12-17) for the serving path
(reference: searcher/searcher_lopqhbase.py:833-912).
"""

import jax
import jax.numpy as jnp


def make_render_one(side: int = 256):
    """Renderer for one [side, side, 3] uint8 image from one PRNG key.

    Identical math to the r03 realfeat recall harness
    (scripts/eval_recall_realfeat.py) so serving and recall artifacts
    draw from the same distribution.
    """
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, side),
                          jnp.linspace(0, 1, side), indexing="ij")

    def one_image(key):
        ks = jax.random.split(key, 8)
        base = jax.random.uniform(ks[0], (1, 1, 3)) * 255.0
        grad_dir = jax.random.normal(ks[1], (2, 3))
        img = base + 60.0 * (yy[..., None] * grad_dir[0]
                             + xx[..., None] * grad_dir[1])
        ang = jax.random.uniform(ks[2], (3,)) * jnp.pi
        freq = jax.random.uniform(ks[3], (3,), minval=2.0, maxval=40.0)
        phase = jax.random.uniform(ks[4], (3,)) * 2 * jnp.pi
        amp = jax.random.uniform(ks[5], (3, 3)) * 50.0
        for g in range(3):
            wave = jnp.sin(2 * jnp.pi * freq[g]
                           * (xx * jnp.cos(ang[g]) + yy * jnp.sin(ang[g]))
                           + phase[g])
            img = img + wave[..., None] * amp[g]
        c = jax.random.uniform(ks[6], (2, 2))
        s = jax.random.uniform(ks[7], (2,), minval=0.01, maxval=0.08)
        for b in range(2):
            blob = jnp.exp(-(((xx - c[b, 0]) ** 2 + (yy - c[b, 1]) ** 2)
                             / (2 * s[b])))
            img = img + 80.0 * blob[..., None]
        return jnp.clip(img, 0, 255).astype(jnp.uint8)

    return one_image


def make_render_batch(batch: int, side: int = 256):
    """Jitted (key) -> [batch, side, side, 3] uint8 renderer.

    Keep this a SEPARATE program from any conv forward: fusing the
    vmapped synthesis into the network produced one enormous HLO whose
    remote compile never returned (>18 min on the dev relay); split,
    each side compiles in seconds.
    """
    one_image = make_render_one(side)

    @jax.jit
    def render(key):
        return jax.vmap(one_image)(jax.random.split(key, batch))

    return render
