from diffusion_model_tpu.utils.logging import RunLogger

__all__ = ["RunLogger"]


def apply_env_platform() -> None:
    """Re-honour ``JAX_PLATFORMS`` from the environment.

    Some sandboxes install a sitecustomize that force-registers a remote
    TPU platform and clobbers ``JAX_PLATFORMS`` at interpreter start, so
    the documented ``JAX_PLATFORMS=cpu python driver.py`` silently runs
    on the TPU. Calling this before first device use restores the env
    var's meaning (``jax.config.update`` wins over sitecustomize).
    Drivers call it at the top of ``main()``.
    """
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
