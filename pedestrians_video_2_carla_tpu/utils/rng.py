"""Training-time PRNG selection.

Dropout masks are the single biggest RNG consumer in training (VideoPose3D:
7 masks of ~10M elements per step). JAX's default threefry2x32 generates
them in software — measured **46% of the whole VideoPose3D train step** on
TPU v5e (10.8 -> 5.8 ms/step with dropout off). The ``rbg`` implementation
lowers to the TPU's native ``RngBitGenerator`` and recovers almost all of
it (6.2 ms/step, 1.74x whole-step speedup) while keeping the same
fold_in/split API. Dataset generation keeps threefry (bit-reproducible
datasets matter more than generator throughput there); only the train-step
dropout stream uses RBG.
"""
import jax


def training_rng(seed: int):
    """Typed RBG key for the training rng stream (dropout / teacher
    forcing); falls back to the default threefry key if the backend has no
    RngBitGenerator lowering."""
    try:
        return jax.random.key(seed, impl="rbg")
    except Exception:
        return jax.random.PRNGKey(seed)
