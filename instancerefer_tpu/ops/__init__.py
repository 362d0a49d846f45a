from instancerefer_tpu.ops.sparse import SparseStage, gather_rows
from instancerefer_tpu.ops import boxes, gru, knn, voxelize
