"""Model zoo (SURVEY.md C17): the reference's three workload families.

The reference evaluates on a scene-labeling CNN (arXiv 1704.04313 §4), a
semantic-segmentation CNN and an OpenPose-style two-branch pose CNN
(arXiv 1808.05488 §VI). Weights here are synthesized (no datasets/network on
this box); pretrained torch weights can be imported via
convert.import_torch_state_dict.
"""

from typing import Callable, Dict, List, Tuple

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str, **kwargs) -> List:
    """Return the layer-spec chain for a named model."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


from . import scene  # noqa: E402,F401
from . import seg    # noqa: E402,F401
from . import pose   # noqa: E402,F401
