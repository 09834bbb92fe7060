"""Synthetic SAM ENCODER distillation smoke (frozen tiny-SAM teacher
encoder -> tiny-SAM student encoder, feature MSE; pairs with
tools/train_interactive_segmentation_distill.py — parity: reference
interactive_segmentation_scripts.py:195 train_distill_sam_encoder)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.interactive_segmentation import (
    FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)
from simpleaicv_tpu.models.interactive_segmentation.light_sam import (
    SAMDistillEncoderModel)


class config:
    network = "sam_encoder_distill_tiny"
    input_image_size = 64

    _tiny = dict(image_size=input_image_size,
                 image_encoder_embedding_planes=64,
                 image_encoder_block_nums=2, image_encoder_head_nums=2,
                 image_encoder_window_size=2,
                 image_encoder_global_attn_indexes=(1,),
                 prompt_encoder_embedding_planes=64)
    teacher = MODELS.create("sam_b", **_tiny)
    student = MODELS.create("sam_b", **_tiny)
    model = SAMDistillEncoderModel(teacher=teacher, student=student)
    train_criterion = LOSSES.create("SAMDistillMSELoss")

    train_dataset = FakeSAMSegmentationDataset(
        16, input_image_size, transform=SamResize(input_image_size))
    test_dataset = None
    train_collater = SAMBatchCollater(resize=input_image_size)
    test_collater = None

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
