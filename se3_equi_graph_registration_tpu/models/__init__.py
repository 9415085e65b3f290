from .egnn import EGCL, EGNN  # noqa: F401
from .pose_head import RegistrationModel, RegistrationOutputs, fuse_scores  # noqa: F401
from . import pointnet, variants  # noqa: F401
