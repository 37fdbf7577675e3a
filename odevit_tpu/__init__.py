"""odevit_tpu — a TPU-native ODE-ViT framework.

Flagship surface, lazily imported (PEP 562) so ``import odevit_tpu``
stays cheap and never drags jax/flax in before the caller has configured
platforms or meshes:

    from odevit_tpu import ViTODE, odeint, CheckpointManager
    model = ViTODE.tiny_cifar()

Everything else lives one submodule down (``odevit_tpu.losses``,
``odevit_tpu.kernels``, ``odevit_tpu.analysis``, ...); the names below
are the ones a reference (Bycarkos/ODE-ViT) user reaches for first.
"""

__version__ = "0.1.0"

_EXPORTS = {
    # models (reference: models/ode_transformer_gpt.py, models/macaron.py)
    "ViTODE": "odevit_tpu.models.vit_ode",
    "ViTMacaron": "odevit_tpu.models.macaron",
    # solver (reference: torchdiffeq.odeint call sites)
    "odeint": "odevit_tpu.core.integrators",
    # training steps / loops (reference: loss_trainer.py, train.py)
    "make_free_train_step": "odevit_tpu.train.steps",
    "make_distill_train_step": "odevit_tpu.train.steps",
    "make_eval_step": "odevit_tpu.train.steps",
    "make_fast_free_train_step": "odevit_tpu.train.fast_steps",
    "make_fast_distill_train_step": "odevit_tpu.train.fast_steps",
    "make_fast_macaron_train_step": "odevit_tpu.train.fast_steps",
    "create_train_state": "odevit_tpu.train.state",
    "make_optimizer": "odevit_tpu.train.state",
    "train_epoch": "odevit_tpu.train.loops",
    "evaluate": "odevit_tpu.train.loops",
    # checkpointing (reference: utils.py save/load)
    "CheckpointManager": "odevit_tpu.ckpt.checkpoint",
    "load_reference_vitode_checkpoint": "odevit_tpu.ckpt.checkpoint",
    # data
    "ArrayLoader": "odevit_tpu.data.pipeline",
    "make_preprocess": "odevit_tpu.data.pipeline",
    "synthetic_dataset": "odevit_tpu.data.pipeline",
    # parallelism (new capability: DP/TP over a jax.sharding.Mesh)
    "make_mesh": "odevit_tpu.parallel.mesh",
    "batch_sharding": "odevit_tpu.parallel.mesh",
    "param_shardings": "odevit_tpu.parallel.mesh",
    # serving
    "ServingEngine": "odevit_tpu.serve.engine",
    # infra
    "MetricLogger": "odevit_tpu.utils.logging",
    "enable_persistent_cache": "odevit_tpu.utils.compile_cache",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'odevit_tpu' has no attribute "
                             f"{name!r}")
    import importlib
    return getattr(importlib.import_module(mod), name)


def __dir__():
    return __all__
