"""Eval-only config for the synthetic tiny-SAM smoke experiment."""

import os

from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.data.interactive_segmentation import (
    FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)

_DIR = os.path.dirname(os.path.abspath(__file__))


class config:
    network = "sam_b"
    input_image_size = 64

    model = MODELS.create(
        network, image_size=input_image_size,
        image_encoder_embedding_planes=64, image_encoder_block_nums=2,
        image_encoder_head_nums=2, image_encoder_window_size=2,
        image_encoder_global_attn_indexes=(1,),
        prompt_encoder_embedding_planes=64)
    trained_model_path = os.path.join(_DIR, "checkpoints", "best")

    test_dataset = FakeSAMSegmentationDataset(
        8, input_image_size, transform=SamResize(input_image_size))
    test_collater = SAMBatchCollater(resize=input_image_size)

    batch_size = 4
    num_workers = 2
