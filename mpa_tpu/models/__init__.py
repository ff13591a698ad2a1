"""L3 task models, addressed by a string registry (the TPU-native analogue of
the reference's importlib model loading, util/utils.py:92-94)."""

from mpa_tpu.models.registry import register_model, get_model, list_models
from mpa_tpu.models.markov_cls import MarkovClassifier
from mpa_tpu.models.repsurf_ssg_2x import RepSurfSSG2x
from mpa_tpu.models.markov_partseg import MarkovPartSeg
from mpa_tpu.models.markov_semseg import MarkovSemSeg
from mpa_tpu.models.markov_pose import MarkovPose, rotation_6d_to_matrix, rotation_geodesic_loss
from mpa_tpu.models.markov_completion import MarkovCompletion
from mpa_tpu.models.markov_partseg_fp import MarkovPartSegFP
import mpa_tpu.extras  # registers optional extra models (dgcnn, ...)

__all__ = [
    "register_model",
    "get_model",
    "list_models",
    "MarkovClassifier",
    "RepSurfSSG2x",
    "MarkovPartSeg",
    "MarkovPartSegFP",
    "MarkovSemSeg",
    "MarkovPose",
    "MarkovCompletion",
    "rotation_6d_to_matrix",
    "rotation_geodesic_loss",
]
