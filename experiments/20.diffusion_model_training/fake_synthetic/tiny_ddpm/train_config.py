"""Synthetic diffusion smoke experiment: tiny UNet, 16x16 fake images, DDIM
sampler with few steps so the per-epoch sample-grid eval stays fast."""

import numpy as np

from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.data.datasets.synthetic import FakeClassificationDataset
from simpleaicv_tpu.diffusion import DDPMTrainer, DDIMSampler
from simpleaicv_tpu.tasks.diffusion import MSELoss


class _DiffusionCollater:

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        return {"image": images / 127.5 - 1.0,
                "label": np.asarray([s["label"] for s in samples], np.int32)}


class config:
    network = "DiffusionUNet"
    input_image_size = 16

    model = MODELS.create(network, inplanes=3, planes=32,
                          planes_multi=(1, 2), time_embedding_ratio=4,
                          block_nums=1, use_attention_planes_multi_idx=(1,))

    trainer = DDPMTrainer(beta_schedule_mode="linear", t=100)
    sampler = DDIMSampler(beta_schedule_mode="linear", ddpm_t=100, ddim_t=5)
    train_criterion = MSELoss()
    eval_sample_grid = 4

    train_dataset = FakeClassificationDataset(num_samples=16, image_hw=16,
                                              num_classes=10)
    test_dataset = None
    train_collater = _DiffusionCollater()
    test_collater = None

    seed = 0
    batch_size = 8
    num_workers = 2
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 2e-4, "global_weight_decay": False,
                           "weight_decay": 0.0,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 0})
    epochs = 1
    print_interval = 1
    use_ema_model = False
