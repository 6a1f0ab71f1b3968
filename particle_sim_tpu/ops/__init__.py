from . import physics, step_jnp

__all__ = ["physics", "step_jnp"]
