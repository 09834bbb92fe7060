"""Face-parsing training entrypoint (parity: reference
tools/train_face_parsing_model.py + face_parsing_scripts.py). Human parsing
uses train_human_parsing.py with the same adapter."""

from common import parse_work_dir, load_train_config

from simpleaicv_tpu.core.trainer import Trainer
from simpleaicv_tpu.tasks import semantic_segmentation as seg


def main():
    args = parse_work_dir()
    config = load_train_config(args)
    ignore_index = getattr(config, "ignore_index", 255)

    trainer = Trainer(
        config, args.work_dir,
        make_loss_fn=seg.make_loss_fn,
        make_eval_fn=lambda model: seg.make_eval_fn(
            model, config.num_classes, ignore_index),
        evaluate=seg.make_evaluate(config.num_classes, ignore_index))
    trainer.run()


if __name__ == "__main__":
    main()
