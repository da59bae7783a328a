"""Training-checkpoint -> serving-params extractor.

Parity with ``TIC/utils/extract_ckpt.py:12-29`` (which unwraps dict/tuple
torch checkpoints into bare state dicts): extracts the params (+ model
state) from an Orbax training checkpoint into a bare serving params dir, or
converts a reference ``.pth`` en route via ``utils/convert``.
"""
from __future__ import annotations


def extract(input_path: str, output_path: str, model_type: str | None = None,
            num_classes: int = 120) -> str:
    if input_path.endswith((".pth", ".pt")):
        from .convert import convert_and_save

        if not model_type:
            raise SystemExit("--model is required for .pth inputs")
        return convert_and_save(input_path, model_type, num_classes, output_path)

    from ..train.checkpoint import load_params, save_params

    restored = load_params(input_path)
    payload = restored
    if isinstance(restored, dict) and "params" in restored:
        payload = {"params": restored["params"]}
        if restored.get("model_state"):
            payload["model_state"] = restored["model_state"]
    save_params(output_path, payload)
    return output_path


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Extract serving params")
    parser.add_argument("--input", required=True,
                        help="Orbax training ckpt dir or reference .pth")
    parser.add_argument("--output", required=True)
    parser.add_argument("--model", default=None, help="model type for .pth inputs")
    parser.add_argument("--num-classes", type=int, default=120)
    args = parser.parse_args()
    out = extract(args.input, args.output, args.model, args.num_classes)
    print(f"Extracted to {out}")
