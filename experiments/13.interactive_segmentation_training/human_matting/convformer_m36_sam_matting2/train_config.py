"""SAM-matting on the combined portrait sets (parity: reference
13.interactive_segmentation_training/human_matting/convformer_m36_sam_matting2
— LightSAM convformer-m36 backbone + matting heads, frozen SAM weights not
required; prompts sampled from the alpha foreground)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import human_matting_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets.combined_folder import HumanMattingDataset
from simpleaicv_tpu.data.matting import MattingResize, \
    MattingRandomHorizontalFlip, MattingNormalize
from simpleaicv_tpu.data.interactive_segmentation import SAMMattingCollater
from simpleaicv_tpu.data.transforms import Compose


class config:
    network = "convformer_m36_sam_matting2"
    input_image_size = 1024

    model = MODELS.create(network, image_size=input_image_size)

    # reference 13.interactive_segmentation_training/human_matting/
    # convformer_m36_sam_matting2/train_config.py:68-80: SAMMattingOneLevelLoss
    # with unit weights, mask_threshold 0.5
    train_criterion = LOSSES.create(
        "SAMMattingMultiLevelLoss",
        global_pred_trimap_ce_loss_weight=1,
        gloabel_pred_trimap_iou_loss_weight=1,
        local_pred_alpha_loss_weight=1,
        local_pred_laplacian_loss_weight=1,
        fusion_pred_alpha_loss_weight=1,
        fusion_pred_laplacian_loss_weight=1,
        composition_loss_weight=1,
        fused_pred_iou_predict_loss_weight=1,
        mask_threshold=0.5)

    train_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["Deep_Automatic_Portrait_Matting",
                       "RealWorldPortrait636", "P3M10K"],
        set_type="train",
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingRandomHorizontalFlip(prob=0.5),
                           MattingNormalize()]))
    test_dataset = HumanMattingDataset(
        human_matting_dataset_path,
        set_name_list=["Deep_Automatic_Portrait_Matting"],
        set_type="val",
        transform=Compose([MattingResize(resize=input_image_size),
                           MattingNormalize()]))
    train_collater = SAMMattingCollater(resize=input_image_size)
    test_collater = SAMMattingCollater(resize=input_image_size,
                                       use_noise_bbox=False)

    seed = 0
    batch_size = 16
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-3,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1, "min_lr": 1e-6})
    epochs = 100
    print_interval = 50
    use_ema_model = False

    mesh_data = -1
    mesh_fsdp = 1
