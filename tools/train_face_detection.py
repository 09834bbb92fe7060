"""Face-detection training entrypoint (parity: reference
tools/train_face_detection_model.py + face_detection_scripts.py:394)."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import detection


def main():
    args = parse_work_dir()
    config = load_train_config(args)

    def evaluate(eval_step, params, state_vars, loader, shard_fn):
        del eval_step, shard_fn
        return detection.evaluate_coco(config.model, params, state_vars,
                                       config.decoder, loader, num_classes=1)

    trainer = Trainer(config, args.work_dir,
                      make_loss_fn=detection.make_loss_fn)
    if getattr(config, "test_dataset", None) is not None and \
            getattr(config, "decoder", None) is not None:
        trainer.evaluate = evaluate
        trainer.eval_step = lambda *a, **k: None
    trainer.run()


if __name__ == "__main__":
    main()
