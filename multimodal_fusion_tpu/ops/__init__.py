from multimodal_fusion_tpu.ops.similarity import (  # noqa: F401
    pairwise_sq_dists,
    morphological_similarity,
    spatial_similarity,
    combined_similarity,
    median_offdiag,
)
from multimodal_fusion_tpu.ops.masked import (  # noqa: F401
    masked_softmax,
    masked_mean,
    masked_topk,
)
from multimodal_fusion_tpu.ops.kmeans import kmeans, kmeans_plus_plus_init  # noqa: F401
from multimodal_fusion_tpu.ops.knn import knn_indices, knn_indices_blockwise  # noqa: F401
from multimodal_fusion_tpu.ops.pallas_knn import knn_indices_auto, pallas_knn  # noqa: F401
from multimodal_fusion_tpu.ops.losses import (  # noqa: F401
    cross_entropy,
    binary_cross_entropy,
    rank1_svd_loss,
    volume_loss,
    clip_alignment_loss,
    aucm_loss,
    cox_ph_loss,
)
from multimodal_fusion_tpu.ops.pallas_similarity import (  # noqa: F401
    pallas_combined_similarity,
    combined_similarity_auto,
)
