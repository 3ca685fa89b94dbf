from wgsparkl_tpu.rigid.body import RigidWorld, BodyCoupling

__all__ = ["RigidWorld", "BodyCoupling"]
