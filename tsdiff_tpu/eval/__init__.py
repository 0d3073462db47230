from tsdiff_tpu.eval.align import kabsch_align, position_align, rotate_transform_mirror  # noqa: F401
from tsdiff_tpu.eval.clustering import cluster_conformers, matches_for, pairwise_metric  # noqa: F401
from tsdiff_tpu.eval.covmat import (  # noqa: F401
    CovMatEvaluator,
    evaluate_conf,
    print_covmat_results,
    rmsd_confusion_matrix,
)
from tsdiff_tpu.eval.dmae import (  # noqa: F401
    calc_dmae,
    dmae_for_graph,
    get_min_dmae_match,
    graph_automorphisms,
)
