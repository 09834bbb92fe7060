"""[parity: reference cifar100/diffusion_unet_train_ddpm_condition_label]
CIFAR-10 class-conditional DDPM (parity: reference
20.diffusion_model_training/cifar100/diffusion_unet_train_ddpm_condition_label
— class-label embedding added to the time embedding)."""

import os
import sys

import numpy as np

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import CIFAR100_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.data.datasets import CIFAR100Dataset
from simpleaicv_tpu.diffusion import DDPMTrainer, DDPMSampler
from simpleaicv_tpu.tasks.diffusion import MSELoss


class _DiffusionCollater:

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        return {"image": images / 127.5 - 1.0,
                "label": np.asarray([s["label"] for s in samples], np.int32)}


class config:
    network = "DiffusionUNet"
    input_image_size = 32

    num_classes = 100
    model = MODELS.create(network, inplanes=3, planes=128,
                          planes_multi=(1, 2, 2, 2), time_embedding_ratio=4,
                          block_nums=2, num_classes=num_classes,
                          use_attention_planes_multi_idx=(1,))

    trainer = DDPMTrainer(beta_schedule_mode="linear", t=1000)
    sampler = DDPMSampler(beta_schedule_mode="linear", t=1000)
    train_criterion = MSELoss()

    train_dataset = CIFAR100Dataset(root_dir=CIFAR100_path, set_name="train")
    test_dataset = None
    train_collater = _DiffusionCollater()
    test_collater = None

    seed = 0
    batch_size = 128
    num_workers = 4
    accumulation_steps = 1

    optimizer = (
        "AdamW",
        {
            "lr": 2e-4,
            "global_weight_decay": False,
            "weight_decay": 0.0,
            "no_weight_decay_layer_name_list": [],
        },
    )
    scheduler = ("CosineLR", {"warm_up_epochs": 1})

    epochs = 500
    print_interval = 100
    use_ema_model = True
    ema_model_decay = 0.9999
