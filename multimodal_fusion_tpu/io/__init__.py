from multimodal_fusion_tpu.io.h5io import (  # noqa: F401
    PatientH5,
    read_channel,
    read_h5_retrying,
    open_h5_retrying,
    write_channel,
    read_hypergraph_group,
    write_hypergraph_group,
)
from multimodal_fusion_tpu.io.fixtures import make_synthetic_dataset  # noqa: F401
