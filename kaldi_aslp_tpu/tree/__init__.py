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
from kaldi_aslp_tpu.tree.cd_phone import (
    acc_tree_stats_cd_phone,
    build_cd_phone_tree,
    compile_questions_phone,
    convert_ali_to_cd_phone,
    tree_bind_info,
)
