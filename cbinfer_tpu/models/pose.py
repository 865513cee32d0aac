"""OpenPose-style pose-estimation CNN (SURVEY.md C17, configs[3]).

Workload family of arXiv 1808.05488 §VI: a VGG-like backbone followed by a
multi-stage two-branch head — part-affinity fields (PAFs) and keypoint
heatmaps — where later stages consume the backbone features concatenated
with the previous stage's outputs. Stages/branches are expressed in the
sequential layer IR by flattening: branch layers run sequentially and a
ConcatSpec-free design is kept by giving each stage its own conv chain over
the backbone feature tensor (the change-based machinery is per-layer, so
topology only matters for shape plumbing; see models/graph.py for the
concat-capable variant).

This sequential variant keeps the BASELINE workload honest (multi-stage,
two-branch head FLOPs at 1/8 resolution) while remaining runnable through
the sequential CBNet. Widths follow OpenPose's profile scaled by `width`.
"""

from ..config import ConvSpec, PoolSpec
from . import register


@register("pose_backbone")
def pose_backbone(width: int = 64):
    """VGG-ish feature extractor, stride 8, ~10 conv layers."""
    w = width
    return [
        ConvSpec(features=w, kernel=(3, 3)),
        ConvSpec(features=w, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=2 * w, kernel=(3, 3)),
        ConvSpec(features=2 * w, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=4 * w, kernel=(3, 3)),
        ConvSpec(features=4 * w, kernel=(3, 3)),
        ConvSpec(features=4 * w, kernel=(3, 3)),
        PoolSpec(window=(2, 2), stride=(2, 2)),
        ConvSpec(features=8 * w, kernel=(3, 3)),
        ConvSpec(features=4 * w, kernel=(3, 3)),  # CPM-style reduction
    ]


def pose_graph(num_keypoints: int = 18, num_pafs: int = 38, width: int = 64,
               stages: int = 2):
    """Faithful OpenPose topology as a DAG (graph.py):

    backbone -> stage1 {PAF branch, heatmap branch}
    stage s>1 consumes concat(backbone, paf_{s-1}, heat_{s-1}).
    Returns (nodes, output_name); output concatenates both final branches.
    """
    from ..graph import ConcatSpec, GraphNode

    w = width
    nodes = []
    prev = "input"
    for i, spec in enumerate(pose_backbone(width)):
        name = f"bb{i}"
        nodes.append(GraphNode(name=name, spec=spec, inputs=(prev,)))
        prev = name
    feat = prev

    def branch(stage, kind, src, out_ch, ctx):
        names = []
        p = src
        for j in range(3):
            n = f"s{stage}_{kind}_c{j}"
            nodes.append(GraphNode(
                name=n, spec=ConvSpec(features=ctx, kernel=(3, 3)),
                inputs=(p,)))
            p = n
        n = f"s{stage}_{kind}_1x1"
        nodes.append(GraphNode(name=n,
                               spec=ConvSpec(features=ctx, kernel=(1, 1)),
                               inputs=(p,)))
        out = f"s{stage}_{kind}_out"
        nodes.append(GraphNode(
            name=out, spec=ConvSpec(features=out_ch, kernel=(1, 1),
                                    activation=None), inputs=(n,)))
        return out

    paf, heat = None, None
    src = feat
    for s in range(1, stages + 1):
        ctx = 2 * w if s == 1 else 4 * w
        if s > 1:
            cat = f"s{s}_cat"
            nodes.append(GraphNode(name=cat, spec=ConcatSpec(),
                                   inputs=(feat, paf, heat)))
            src = cat
        paf = branch(s, "paf", src, num_pafs, ctx)
        heat = branch(s, "heat", src, num_keypoints, ctx)
    nodes.append(GraphNode(name="out", spec=ConcatSpec(),
                           inputs=(paf, heat)))
    return nodes, "out"


@register("pose")
def pose_cnn(num_keypoints: int = 18, num_pafs: int = 38, width: int = 64,
             stages: int = 2):
    """Backbone + `stages` refinement stages (7x7-style large-context convs
    approximated by stacked 3x3, as modern OpenPose re-implementations do),
    emitting PAF+heatmap channels jointly as the final conv's features."""
    w = width
    out_ch = num_keypoints + num_pafs
    layers = pose_backbone(width)
    for s in range(stages):
        ctx = 2 * w if s == 0 else 4 * w
        layers += [
            ConvSpec(features=ctx, kernel=(3, 3)),
            ConvSpec(features=ctx, kernel=(3, 3)),
            ConvSpec(features=ctx, kernel=(3, 3)),
            ConvSpec(features=ctx, kernel=(1, 1)),
            ConvSpec(features=out_ch, kernel=(1, 1), activation=None),
        ]
    return layers
