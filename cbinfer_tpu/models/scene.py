"""Scene-labeling CNN (SURVEY.md C17, configs[1] of BASELINE.json).

Modeled on the workload family of arXiv 1704.04313 §4 (per-pixel scene
labeling on surveillance video): a small conv/pool/relu chain ending in a
1x1 classifier, output at 1/4 spatial resolution. Channel widths are kept
MXU-friendly (multiples of 32; >=128 where the FLOPs live when scaled up).
"""

from ..config import ConvSpec, PoolSpec
from . import register


@register("scene")
def scene_cnn(num_classes: int = 8, width: int = 32):
    """~7-layer scene-labeling chain; output stride 4."""
    return [
        ConvSpec(features=width, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=2 * width, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=2 * width, kernel=(3, 3)),
        ConvSpec(features=2 * width, kernel=(3, 3)),
        ConvSpec(features=num_classes, kernel=(1, 1), activation=None),
    ]


@register("scene_tiny")
def scene_tiny(num_classes: int = 5, width: int = 16):
    """3-layer bring-up variant (fast CI / compile checks)."""
    return [
        ConvSpec(features=width, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=width, kernel=(3, 3)),
        ConvSpec(features=num_classes, kernel=(1, 1), activation=None),
    ]
