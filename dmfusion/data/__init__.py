from dmfusion.data.scene import (  # noqa: F401
    Scene,
    load_scene,
    minmax_normalize,
    pad_scene,
    split_labels,
    split_labels_masked,
    synthetic_scene,
)
from dmfusion.data.patches import gather_dual, gather_quad  # noqa: F401
