"""A/B/C classification comparison (reference ``separated_classification.py``):
train three classifiers — (A) on raw noisy data, (B) on AE-denoised
predictions, (C) on clean data — and report their metrics side by side."""
import json
import sys
from typing import Dict, List

from .modeling import main as modeling_main


def main(args: List[str]) -> Dict[str, Dict]:
    results: Dict[str, Dict] = {}

    # A: classifier on raw (noisy) data
    a = modeling_main(list(args) + [
        "--flow=classification", "--mode=train", "--renderers", "none",
        "--run_name=cls-raw-noisy"])
    results["raw_noisy"] = a.get("val_metrics", {})

    # B: denoise with the AE, then classify the predictions
    ae = modeling_main(list(args) + [
        "--flow=autoencoder", "--mode=predict",
        "--predict_sets", "train", "val", "test",
        "--renderers", "none", "--run_name=cls-ae"])
    dm = ae["dm"]
    subsets_dir = None
    for set_name, outputs in ae["predictions"].items():
        if hasattr(dm, "save_predictions"):
            subsets_dir = dm.save_predictions(set_name, outputs,
                                              run_id="sep")
    if subsets_dir is not None:
        b = modeling_main(list(args) + [
            "--flow=classification", "--mode=train",
            f"--subsets_dir={subsets_dir}", "--noise", "zero",
            "--renderers", "none", "--run_name=cls-denoised"])
        results["ae_denoised"] = b.get("val_metrics", {})

    # C: classifier on clean data (noise off)
    c = modeling_main(list(args) + [
        "--flow=classification", "--mode=train", "--noise", "zero",
        "--renderers", "none", "--run_name=cls-clean"])
    results["clean"] = c.get("val_metrics", {})

    print(json.dumps({k: {m: v for m, v in d.items()
                          if isinstance(v, (int, float))}
                      for k, d in results.items()}, indent=1))
    return results


def run():
    main(sys.argv[1:])


if __name__ == "__main__":
    run()
