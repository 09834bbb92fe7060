"""Run every fake_synthetic experiment end-to-end through its real train CLI
on a small virtual CPU mesh (integration smoke: config -> trainer -> engine
-> eval -> checkpoints). Usage:

    python tools/run_synthetic_smokes.py [name-filter ...]

Each smoke gets a scratch copy of its experiment dir under /tmp so the repo
tree stays clean. Prints one PASS/FAIL line per smoke and exits non-zero on
any failure.
"""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family dir prefix -> train CLI (mirrors the reference driver mapping)
CLI = {
    "0.classification_training": "train_classification.py",
    "1.distillation_training": "train_distill_classification.py",
    "2.masked_image_modeling_training": "train_mae_self_supervised.py",
    "3.detection_training/fake_synthetic/resnet18_fcos": "train_detection.py",
    "3.detection_training/fake_synthetic/resnet18_detr":
        "train_detr_detection.py",
    "3.detection_training/fake_synthetic/resnet18_dino":
        "train_detr_detection.py",
    "4.semantic_segmentation_training": "train_semantic_segmentation.py",
    "5.instance_segmentation_training": "train_instance_segmentation.py",
    "6.salient_object_detection_training":
        "train_salient_object_detection.py",
    "7.human_matting_training": "train_human_matting.py",
    "8.ocr_text_detection_training": "train_text_detection.py",
    "9.ocr_text_recognition_training": "train_text_recognition.py",
    "10.face_detection_training": "train_face_detection.py",
    "11.face_parsing_training": "train_face_parsing.py",
    "12.human_parsing_training": "train_human_parsing.py",
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_distill":
        "train_interactive_segmentation_distill_sam.py",
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_encoder_distill":
        "train_interactive_segmentation_distill.py",
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_matting":
        "train_interactive_matting.py",
    "13.interactive_segmentation_training": "train_interactive_segmentation.py",
    "20.diffusion_model_training": "train_diffusion_model.py",
}


# family -> eval CLI driven on the train smoke's checkpoint (the reference
# train.sh/test.sh ritual). Families with loss-only training (MAE, encoder
# distill) have no eval CLI.
TEST_CLI = {
    "0.classification_training": "test_classification.py",
    "3.detection_training": "test_detection.py",
    "4.semantic_segmentation_training": "test_semantic_segmentation.py",
    "5.instance_segmentation_training": "test_instance_segmentation.py",
    "6.salient_object_detection_training":
        "test_salient_object_detection.py",
    "7.human_matting_training": "test_human_matting.py",
    "8.ocr_text_detection_training": "test_text_detection.py",
    "9.ocr_text_recognition_training": "test_text_recognition.py",
    "10.face_detection_training": "test_face_detection.py",
    "11.face_parsing_training": "test_face_parsing.py",
    "12.human_parsing_training": "test_human_parsing.py",
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_matting":
        "test_interactive_matting.py",
    # distill checkpoints hold teacher+student trees; their eval requires
    # extracting the student first (loss-only smokes, like the reference's
    # objects365/MAE drivers)
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_distill":
        None,
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam_encoder_distill":
        None,
    "13.interactive_segmentation_training/fake_synthetic/tiny_sam":
        "test_interactive_segmentation.py",
    "20.diffusion_model_training": "test_diffusion_model.py",
}


def test_cli_for(rel):
    for prefix in sorted(TEST_CLI, key=len, reverse=True):
        if rel.startswith(prefix):
            return TEST_CLI[prefix]
    return None


def cli_for(rel):
    for prefix in sorted(CLI, key=len, reverse=True):
        if rel.startswith(prefix):
            return CLI[prefix]
    return None


def main():
    filters = sys.argv[1:]
    exp_root = os.path.join(REPO, "experiments")
    smokes = []
    for dirpath, _, files in os.walk(exp_root):
        if "fake_synthetic" in dirpath and "train_config.py" in files:
            smokes.append(os.path.relpath(dirpath, exp_root))
    smokes.sort()
    if filters:
        smokes = [s for s in smokes if any(f in s for f in filters)]

    env = dict(os.environ,
               SIMPLEAICV_PLATFORM="cpu", SIMPLEAICV_CPU_DEVICES="2",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    failures = []
    for rel in smokes:
        cli = cli_for(rel)
        if cli is None:
            print(f"SKIP  {rel} (no CLI mapping)")
            continue
        work = tempfile.mkdtemp(prefix="smoke_")
        for f in os.listdir(os.path.join(exp_root, rel)):
            if f.endswith(".py"):
                shutil.copy(os.path.join(exp_root, rel, f), work)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", cli),
             "--work-dir", work],
            env=env, capture_output=True, text=True, timeout=1500)
        ok = (r.returncode == 0 and
              os.path.isdir(os.path.join(work, "checkpoints")))
        print(f"{'PASS' if ok else 'FAIL'}  {rel}  [{cli}]", flush=True)
        if not ok:
            failures.append(rel)
            tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
            print("      " + "\n      ".join(tail), flush=True)
        tcli = test_cli_for(rel)
        tcfg = os.path.join(work, "test_config.py")
        if ok and tcli and os.path.exists(tcfg):
            best = os.path.join(work, "checkpoints", "best")
            if os.path.isdir(best):
                txt = open(tcfg).read().replace(
                    'trained_model_path = ""',
                    f'trained_model_path = "{best}"')
                open(tcfg, "w").write(txt)
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", tcli),
                 "--work-dir", work],
                env=env, capture_output=True, text=True, timeout=1500)
            tok = r.returncode == 0
            print(f"{'PASS' if tok else 'FAIL'}  {rel}  [{tcli}]",
                  flush=True)
            if not tok:
                failures.append(rel + ":test")
                tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
                print("      " + "\n      ".join(tail), flush=True)
        shutil.rmtree(work, ignore_errors=True)
    print(f"\n{len(smokes) - len(failures)}/{len(smokes)} smokes passed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
