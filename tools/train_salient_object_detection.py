"""Salient-object-detection training entrypoint (parity: reference
tools/train_salient_object_detection_model.py)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import binary_segmentation as bseg


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    criterion_list = config.criterion_list

    trainer = Trainer(
        config, args.work_dir,
        make_loss_fn=lambda model, _c: bseg.make_loss_fn(model,
                                                         criterion_list),
        make_eval_fn=bseg.make_eval_fn,
        evaluate=bseg.make_evaluate())
    trainer.run()


if __name__ == "__main__":
    main()
