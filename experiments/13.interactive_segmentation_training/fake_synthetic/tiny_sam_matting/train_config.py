"""Synthetic SAM-matting smoke experiment (tiny SAM + matting heads)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.matting import FakeHumanMattingDataset, \
    MattingResize, MattingNormalize
from simpleaicv_tpu.data.interactive_segmentation import SAMMattingCollater
from simpleaicv_tpu.data.transforms import Compose
from simpleaicv_tpu.models.interactive_segmentation.sam_matting import \
    SAMMatting


class config:
    network = "tiny_sam_matting"
    input_image_size = 64

    _sam = MODELS.create(
        "sam_b", image_size=input_image_size,
        image_encoder_embedding_planes=64, image_encoder_block_nums=2,
        image_encoder_head_nums=2, image_encoder_window_size=2,
        image_encoder_global_attn_indexes=(1,),
        prompt_encoder_embedding_planes=64)
    model = SAMMatting(sam=_sam)

    train_criterion = LOSSES.create("SAMMattingOneLevelLoss",
                                    mask_threshold=0.5)

    train_dataset = FakeHumanMattingDataset(
        num_samples=16, image_hw=64,
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingNormalize()]))
    test_dataset = None
    train_collater = SAMMattingCollater(resize=input_image_size)
    test_collater = None

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 3e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0, "min_lr": 1e-6})
    epochs = 1
    print_interval = 2
    use_ema_model = False
