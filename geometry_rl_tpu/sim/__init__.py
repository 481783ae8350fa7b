from .types import (  # noqa: F401
    FixedJointSpec,
    ParticleState,
    RigidBodySpec,
    RigidBodyState,
    SceneState,
    axis_mask_from_bits,
    box_inertia,
)
from .xpbd import (  # noqa: F401
    BodyAttachment,
    BodyPairContact,
    ContactSet,
    DistanceGroup,
    ParticleSDFContact,
    ParticleSelfContact,
    ParticleSpec,
    step_physics,
    xpbd_substep,
)
