"""Synthetic tiny ViT-MAE pretrain smoke (CPU/TPU-runnable)."""

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import FakeClassificationDataset
from simpleaicv_tpu.data.collater import ClassificationCollater


class config:
    network = "vit_base_patch16_224_mae_pretrain_model"
    input_image_size = 64

    model = MODELS.create(network, image_size=input_image_size,
                          decoder_embedding_planes=64,
                          decoder_block_nums=1, decoder_head_nums=2)
    train_criterion = LOSSES.create("MAEMSELoss")

    train_dataset = FakeClassificationDataset(num_samples=64, image_hw=64,
                                              num_classes=10)
    test_dataset = None
    train_collater = ClassificationCollater()
    test_collater = None

    seed = 0
    batch_size = 16
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 6e-4, "beta1": 0.9, "beta2": 0.95,
                           "global_weight_decay": False,
                           "weight_decay": 0.05,
                           "no_weight_decay_layer_name_list":
                               ["cls_token", "mask_token"]})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 2
    print_interval = 2
    use_ema_model = False
