"""crossclr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) cross-modal contrastive
learning framework with the capabilities of
amazon-science/crossmodal-contrastive-learning (CrossCLR, ICCV 2021).

Layout:
  losses/      pure-jnp loss math + reference-API criterion classes
  ops/         Pallas TPU kernels (fused CrossCLR loss) with jnp fallbacks
  parallel/    mesh construction, global-negative all-gather loss wrappers
  models/      Flax dual-encoder towers (video / text)
  data/        feature datasets (synthetic + file-backed) and batching
  training/    train step, optimizer, checkpointing, metrics
  evaluation/  video↔text retrieval metrics (R@K, MdR, MnR)
  utils/       configs, logging, profiling helpers
"""

__version__ = "0.1.0"

from . import losses

# heavier subpackages (ops, models, training, ...) are imported lazily so
# `import crossclr_tpu` stays cheap and torch-free
_SUBMODULES = (
    "ops",
    "parallel",
    "models",
    "data",
    "training",
    "evaluation",
    "utils",
)


def __getattr__(name):
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["losses", *_SUBMODULES, "__version__"]
