from structure_knowledge_distillation_tpu.data.cityscapes import (
    IMG_MEAN_BGR,
    CityscapesDataset,
    CityscapesTestDataset,
    batch_iterator,
    id2trainid,
    trainid2id,
)
from structure_knowledge_distillation_tpu.data.camvid import CAMVID_MEAN, CamVidDataset
from structure_knowledge_distillation_tpu.data.prefetch import device_prefetch
from structure_knowledge_distillation_tpu.data.voc import VOCDataset, VOCTestDataset
from structure_knowledge_distillation_tpu.data.synthetic import (
    SyntheticSegDataset,
    synthetic_batches,
)

__all__ = [
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
