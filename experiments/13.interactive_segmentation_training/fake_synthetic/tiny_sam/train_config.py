"""Synthetic tiny-SAM smoke experiment."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.interactive_segmentation import (
    FakeSAMSegmentationDataset, SAMBatchCollater, SamResize)


class config:
    network = "sam_b"
    input_image_size = 64

    model = MODELS.create(
        network, image_size=input_image_size,
        image_encoder_embedding_planes=64, image_encoder_block_nums=2,
        image_encoder_head_nums=2, image_encoder_window_size=2,
        image_encoder_global_attn_indexes=(1,),
        prompt_encoder_embedding_planes=64)
    train_criterion = LOSSES.create("SAMMultiLevelLoss")

    train_dataset = FakeSAMSegmentationDataset(
        32, input_image_size, transform=SamResize(input_image_size))
    # two named test sets: per-epoch eval reports per-dataset + combined IoU
    # (reference interactive_segmentation_scripts.py:87-105 test_loader_list)
    test_dataset = {
        "setA": FakeSAMSegmentationDataset(
            8, input_image_size, transform=SamResize(input_image_size)),
        "setB": FakeSAMSegmentationDataset(
            8, input_image_size, transform=SamResize(input_image_size)),
    }
    train_collater = SAMBatchCollater(resize=input_image_size)
    test_collater = SAMBatchCollater(resize=input_image_size,
                                     use_noise_bbox=False)

    prompt_probs = {"point": 0.34, "box": 0.33, "mask": 0.33}
    decoder_point_iters = 2

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
