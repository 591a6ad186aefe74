from autovfx_tpu.physics.world import RigidWorld, simulate, rb_transform_schema

__all__ = ["RigidWorld", "simulate", "rb_transform_schema"]
