from dmfusion.ops.metrics import (  # noqa: F401
    aa_oa,
    confusion_matrix,
    kappa,
    render_class_map,
)
from dmfusion.ops.ihs import (  # noqa: F401
    block_mean,
    ihs_transform,
    pan2ms,
    replicate_channels,
    unpooling,
)
from dmfusion.ops.image import equalize_histogram, render_tensor, scene_to_tiles, tiles_to_scene  # noqa: F401
