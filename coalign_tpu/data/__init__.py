from coalign_tpu.data.batch import IntermediateFusionBatcher  # noqa: F401
from coalign_tpu.data.synthetic import SyntheticScenes  # noqa: F401
