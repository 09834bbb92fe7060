"""Knowledge-distillation wrapper (parity: reference
simpleAICV/distillation/distillmodel.py:19 — KDModel holding teacher+student,
teacher optionally frozen).

TPU-first: teacher and student are separate linen modules; the teacher's params
live in a separate (non-trained) tree and its forward runs under
``stop_gradient`` — freezing without any requires_grad machinery.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.registry import BACKBONES, MODELS


class KDModel(nn.Module):
    teacher: nn.Module
    student: nn.Module
    freeze_teacher: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        tea_out = self.teacher(x, False if self.freeze_teacher else train)
        if self.freeze_teacher:
            tea_out = jax.lax.stop_gradient(tea_out)
        stu_out = self.student(x, train)
        return tea_out, stu_out


@MODELS.register()
def KDTeacherStudent(teacher_type: str, student_type: str, num_classes: int,
                     freeze_teacher: bool = True, **kwargs):
    teacher = BACKBONES.create(teacher_type, num_classes=num_classes)
    student = BACKBONES.create(student_type, num_classes=num_classes)
    return KDModel(teacher=teacher, student=student,
                   freeze_teacher=freeze_teacher)
