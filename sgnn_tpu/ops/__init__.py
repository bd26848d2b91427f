from sgnn_tpu.ops.sparse import (  # noqa: F401
    SparseTensor,
    make_sparse,
    sparse_to_dense,
    dense_to_sparse,
    gather_dense,
)
from sgnn_tpu.ops.conv import (  # noqa: F401
    submanifold_conv3d,
    strided_conv3d_down,
    unpool_x2,
)
