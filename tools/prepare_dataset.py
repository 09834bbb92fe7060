"""Dataset-preparation CLI: raw public downloads -> the standardized layouts
the simpleaicv_tpu datasets consume (parity: the reference's per-task
``*_dataset_processing`` script dirs, collapsed into one driver).

Usage:
  python tools/prepare_dataset.py rctw        --root <RCTW>  --out <dir>
  python tools/prepare_dataset.py art         --root <ART>   --out <dir>
  python tools/prepare_dataset.py lsvt        --root <LSVT>  --out <dir>
  python tools/prepare_dataset.py mlt         --root <MLT>   --out <dir>
  python tools/prepare_dataset.py rects       --root <ReCTS> --out <dir>
  python tools/prepare_dataset.py text-lines  --root <processed-det-root> \
         --set-name ICDAR2017RCTW_text_detection --out <dir>
  python tools/prepare_dataset.py char-table  --labels a.json b.json --out t.json
  python tools/prepare_dataset.py face-synthetics --root <FS>   --out <dir>
  python tools/prepare_dataset.py celebamask-hq   --root <CMHQ> --out <dir>
  python tools/prepare_dataset.py lip             --root <LIP>  --out <dir>
  python tools/prepare_dataset.py cihp            --root <CIHP> --out <dir>
  python tools/prepare_dataset.py sam-masks   --root <pairs> --out <dir> \
         --set-type train
  python tools/prepare_dataset.py pack-imagefolder --root <ImageFolder> \
         --out train_224.pack --size 224
  python tools/prepare_dataset.py pack-cifar  --root <CIFAR> --out c.pack \
         --dataset cifar100 --split train
  python tools/prepare_dataset.py pack-coco   --root <COCO2017> \
         --out train_1024.pack --set-name train2017 --size 1024
  python tools/prepare_dataset.py pack-sam    --root <SA-1B> \
         --out sa0_1024.pack --set-names sa_000000 --set-type train

Packing (decode-once cache): writes every sample as a fixed-stride uint8
record at the training transport resolution so steady-state epochs read
bytes through an mmap gather instead of decoding JPEGs
(simpleaicv_tpu/data/packed.py; feeds the on-device augmentation path).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpleaicv_tpu.data import processing as P


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    def std(name):
        p = sub.add_parser(name)
        p.add_argument("--root", required=True)
        p.add_argument("--out", required=True)
        return p

    for name in ("rctw", "art", "lsvt", "mlt", "rects"):
        p = std(name)
        p.add_argument("--train-ratio", type=float, default=0.9)
        p.add_argument("--max-side", type=int, default=1920)
        p.add_argument("--seed", type=int, default=0)

    p = std("text-lines")
    p.add_argument("--set-name", required=True)
    p.add_argument("--out-set-name", default=None)

    p = sub.add_parser("char-table")
    p.add_argument("--labels", nargs="+", required=True)
    p.add_argument("--out", required=True)

    for name in ("face-synthetics", "celebamask-hq", "lip", "cihp"):
        std(name)

    p = std("sam-masks")
    p.add_argument("--set-type", default="train")

    p = std("pack-imagefolder")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--letterbox", action="store_true")
    p.add_argument("--threads", type=int, default=0)

    p = std("pack-cifar")
    p.add_argument("--dataset", choices=("cifar10", "cifar100"),
                   default="cifar100")
    p.add_argument("--split", choices=("train", "test"), default="train")

    p = std("pack-coco")
    p.add_argument("--set-name", default="train2017")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--max-annots", type=int, default=100)

    p = std("pack-sam")
    p.add_argument("--set-names", nargs="+", default=["sa_000000"])
    p.add_argument("--set-type", default="train")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--point-candidates", type=int, default=32)

    args = parser.parse_args(argv)

    if args.cmd in ("rctw", "art", "lsvt", "mlt", "rects"):
        fn = {"rctw": P.process_rctw, "art": P.process_art,
              "lsvt": P.process_lsvt, "mlt": P.process_mlt,
              "rects": P.process_rects}[args.cmd]
        fn(args.root, args.out, train_ratio=args.train_ratio,
           max_side=args.max_side, seed=args.seed)
    elif args.cmd == "text-lines":
        P.extract_text_lines(args.root, args.set_name, args.out,
                             out_set_name=args.out_set_name)
    elif args.cmd == "char-table":
        table = P.build_char_table(args.labels, args.out)
        print(f"char table: {len(table)} chars -> {args.out}")
    elif args.cmd == "face-synthetics":
        P.process_face_synthetics(args.root, args.out)
    elif args.cmd == "celebamask-hq":
        P.process_celebamask_hq(args.root, args.out)
    elif args.cmd == "lip":
        P.process_lip(args.root, args.out)
    elif args.cmd == "cihp":
        P.process_cihp(args.root, args.out)
    elif args.cmd == "sam-masks":
        P.convert_mask_folder_to_sa1b(args.root, args.out,
                                      set_type=args.set_type)
    elif args.cmd == "pack-imagefolder":
        from simpleaicv_tpu.data.packed import pack_image_folder
        pack_image_folder(args.root, args.out, image_hw=args.size,
                          letterbox=args.letterbox, n_threads=args.threads)
        print(f"packed -> {args.out}")
    elif args.cmd == "pack-cifar":
        from simpleaicv_tpu.data.datasets.cifar import (CIFAR10Dataset,
                                                        CIFAR100Dataset)
        from simpleaicv_tpu.data.packed import pack_dataset
        cls = CIFAR100Dataset if args.dataset == "cifar100" else \
            CIFAR10Dataset
        ds = cls(args.root, set_name=args.split)
        pack_dataset(ds, args.out, progress_every=10000)
        print(f"packed {len(ds)} samples -> {args.out}")
    elif args.cmd == "pack-coco":
        from simpleaicv_tpu.data.datasets.coco import CocoDetection
        from simpleaicv_tpu.data.packed_tasks import pack_detection_dataset
        ds = CocoDetection(args.root, set_name=args.set_name,
                           filter_no_object_image=True)
        pack_detection_dataset(ds, args.out, image_hw=args.size,
                               max_annots=args.max_annots,
                               meta={"set_name": args.set_name},
                               progress_every=5000)
        print(f"packed {len(ds)} samples -> {args.out}")
    elif args.cmd == "pack-sam":
        from simpleaicv_tpu.data.datasets.sam_segmentation import \
            SAMSegmentationDataset
        from simpleaicv_tpu.data.packed_tasks import pack_sam_dataset
        ds = SAMSegmentationDataset(args.root,
                                    set_name_list=args.set_names,
                                    set_type=args.set_type)
        pack_sam_dataset(ds, args.out, image_hw=args.size,
                         max_point_candidates=args.point_candidates,
                         meta={"set_names": args.set_names},
                         progress_every=5000)
        print(f"packed {len(ds)} samples -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
