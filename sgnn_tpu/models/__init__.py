from sgnn_tpu.models.sgnn import (  # noqa: F401
    GenModelOutput,
    concat_skip,
    genmodel_apply,
    genmodel_init,
)
from sgnn_tpu.models.dense_flow import (  # noqa: F401
    DenseFlowOutput,
    genmodel_apply_dense,
)
