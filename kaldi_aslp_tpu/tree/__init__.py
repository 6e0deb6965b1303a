from kaldi_aslp_tpu.tree.cluster import (
    GaussStats,
    cluster_bottom_up,
    kmeans_cluster,
)
from kaldi_aslp_tpu.tree.build_tree import (
    ContextDependency,
    TreeNode,
    build_tree,
    cluster_phones_into_questions,
    stats_from_alignment,
)
