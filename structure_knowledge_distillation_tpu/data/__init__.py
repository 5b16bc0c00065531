from structure_knowledge_distillation_tpu.data.cityscapes import (
    IMG_MEAN_BGR,
    CityscapesDataset,
    CityscapesTestDataset,
    batch_iterator,
    id2trainid,
    trainid2id,
)
from structure_knowledge_distillation_tpu.data.camvid import CAMVID_MEAN, CamVidDataset
from structure_knowledge_distillation_tpu.data.prefetch import (
    Chunk,
    cast_batches,
    chunk_batches,
    device_prefetch,
    put_global,
)

# (eval resolution, default class count) per dataset — the reference's
# evaluate_main serves cityscapes at (1024,2048) and VOC at (505,505)
# (networks/evaluate.py:156-206); CamVid (360,480)/11 is the ESPNet transfer
# config. Both cli.train's in-training eval and cli.eval use this map, so a
# CamVid/VOC training run evaluates at its dataset's native size.
DATASET_EVAL_DEFAULTS = {
    "cityscapes": ((1024, 2048), 19),
    "cityscape": ((1024, 2048), 19),
    "voc": ((505, 505), 21),
    "camvid": ((360, 480), 11),
}
from structure_knowledge_distillation_tpu.data.voc import VOCDataset, VOCTestDataset
from structure_knowledge_distillation_tpu.data.synthetic import (
    SyntheticSegDataset,
    synthetic_batches,
)

__all__ = [
    "DATASET_EVAL_DEFAULTS",
    "Chunk",
    "cast_batches",
    "chunk_batches",
    "put_global",
    "IMG_MEAN_BGR",
    "CityscapesDataset",
    "CityscapesTestDataset",
    "batch_iterator",
    "id2trainid",
    "trainid2id",
    "device_prefetch",
    "SyntheticSegDataset",
    "synthetic_batches",
    "CAMVID_MEAN",
    "CamVidDataset",
    "VOCDataset",
    "VOCTestDataset",
]
