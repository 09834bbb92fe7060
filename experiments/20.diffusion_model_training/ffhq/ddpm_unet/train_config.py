import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))

import numpy as np

from path import FFHQ_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS
from simpleaicv_tpu.data.datasets import FFHQDataset
from simpleaicv_tpu.data.datasets.face_images import DiffusionNormalize
from simpleaicv_tpu.data.transforms import Compose, Resize, CenterCrop
from simpleaicv_tpu.diffusion import DDPMTrainer, DDPMSampler
from simpleaicv_tpu.tasks.diffusion import MSELoss


class _Collater:

    def __call__(self, samples):
        images = np.stack([s["image"] for s in samples]).astype(np.float32)
        return {"image": images}


class config:
    """FFHQ 64 DDPM (parity: reference; target FID 6.409)."""
    network = "DiffusionUNet"
    input_image_size = 64

    model = MODELS.create(network, inplanes=3, planes=128,
                          planes_multi=(1, 2, 2, 2),
                          use_attention_planes_multi_idx=(1,))
    trainer = DDPMTrainer(t=1000)
    sampler = DDPMSampler(t=1000)
    train_criterion = MSELoss()

    train_dataset = FFHQDataset(
        FFHQ_path, set_name="train",
        transform=Compose([Resize(resize=input_image_size),
                           CenterCrop(resize=input_image_size),
                           DiffusionNormalize()]))
    test_dataset = None
    train_collater = _Collater()
    test_collater = None

    seed = 0
    batch_size = 64
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 2e-4, "global_weight_decay": False,
                           "weight_decay": 0.0,
                           "no_weight_decay_layer_name_list": []})
    scheduler = ("CosineLR", {"warm_up_epochs": 1})
    epochs = 500
    print_interval = 100
    use_ema_model = True
    ema_model_decay = 0.9999
