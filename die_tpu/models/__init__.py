from die_tpu.models.base import (CallableModelPolicy, Policy,
                                 postprocess_action, register)
from die_tpu.models.gradient import GradientPolicy, PhysarumPolicy
from die_tpu.models.nca import NCAPolicy
from die_tpu.models.static import BrownianPolicy, ConstPolicy

__all__ = ["Policy", "CallableModelPolicy", "postprocess_action", "register", "GradientPolicy",
           "PhysarumPolicy", "NCAPolicy", "BrownianPolicy", "ConstPolicy"]
