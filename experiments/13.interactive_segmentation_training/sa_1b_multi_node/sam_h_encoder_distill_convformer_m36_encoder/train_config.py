"""SAM-H encoder -> ConvFormer-M36 encoder distillation on SA-1B,
multi-node recipe (parity: reference 13.interactive_segmentation_training/
sa_1b_multi_node/sam_h_encoder_distill_convformer_m36_encoder — two-node
torchrun; here multi-host is a mesh concern: launch one process per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID (or the
reference-style MASTER_ADDR/RANK/WORLD_SIZE) and
parallel.multihost.initialize_multihost wires jax.distributed; see train.sh.
Target distill loss 0.1051 per results.md:473-481)."""

import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             *[".."] * 4, "tools"))
from path import interactive_segmentation_dataset_path  # noqa: E402

from simpleaicv_tpu.core.registry import MODELS, LOSSES
from simpleaicv_tpu.data.datasets import SAMSegmentationDataset
from simpleaicv_tpu.data.interactive_segmentation import (SAMBatchCollater,
                                                          SamResize)
from simpleaicv_tpu.models.interactive_segmentation.light_sam import (
    SAMDistillEncoderModel, LightSAM)


class config:
    network = "sam_h_encoder_distill_convformer_m36_encoder"
    input_image_size = 1024

    teacher = MODELS.create("sam_h", image_size=input_image_size,
                            use_gradient_checkpoint=True,
                            use_flash_attention=True,
                            frozen_image_encoder=True)
    teacher_model_path = ""  # official SAM-H weights (converted)
    student = LightSAM(backbone_type="convformer_m36",
                       image_size=input_image_size)
    model = SAMDistillEncoderModel(teacher=teacher, student=student)
    train_criterion = LOSSES.create("SAMDistillMSELoss")

    train_dataset = SAMSegmentationDataset(
        interactive_segmentation_dataset_path,
        set_name_list=["sa_000020", "sa_000021", "sa_000022", "sa_000023"],
        set_type="train", transform=SamResize(input_image_size))
    test_dataset = None
    train_collater = SAMBatchCollater(resize=input_image_size)
    test_collater = None

    seed = 0
    batch_size = 32          # global across hosts
    num_workers = 16
    accumulation_steps = 1
    optimizer = ("AdamW", {"lr": 1e-4, "global_weight_decay": False,
                           "weight_decay": 1e-4,
                           "no_weight_decay_layer_name_list": [],
                           "frozen_layer_name_list": ["teacher"]})
    scheduler = ("CosineLR", {"warm_up_epochs": 1})
    epochs = 5
    print_interval = 50
    use_ema_model = False
