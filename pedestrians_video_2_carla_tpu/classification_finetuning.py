"""Two-stage denoise-then-classify pipeline (reference
``classification_finetuning.py:44-175``): (1) run a pretrained denoising
autoencoder in predict mode over train/val/test and save the denormalized
predictions as a new subsets tree; (2) fine-tune a classifier on the AE
outputs with input noise forced off."""
import sys
from typing import List

from .modeling import main as modeling_main


def main(args: List[str]):
    # stage 1: predict with the (pretrained) autoencoder over all sets
    predict_args = list(args) + [
        "--flow=autoencoder", "--mode=predict",
        "--predict_sets", "train", "val", "test",
        "--renderers", "none", "--run_name=ae-predict",
    ]
    results = modeling_main(predict_args)
    dm = results["dm"]

    prediction_dirs = {}
    for set_name, outputs in results["predictions"].items():
        if hasattr(dm, "save_predictions"):
            prediction_dirs[set_name] = dm.save_predictions(
                set_name, outputs, run_id="ae")

    if not prediction_dirs:
        raise RuntimeError("The datamodule does not support predictions-as-"
                           "dataset chaining (save_predictions).")
    subsets_dir = next(iter(prediction_dirs.values()))

    # stage 2: fine-tune the classifier on the denoised data, noise off
    tune_args = list(args) + [
        "--flow=classification", "--mode=tune",
        f"--subsets_dir={subsets_dir}",
        "--noise", "zero", "--renderers", "none",
        "--run_name=classifier-finetune",
    ]
    return modeling_main(tune_args)


def run():
    main(sys.argv[1:])


if __name__ == "__main__":
    run()
