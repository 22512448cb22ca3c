"""Export a trained flyp_tpu checkpoint to the torch CLIP ``.pt`` layout.

The reverse of ``--clip_load`` / ``models/convert.py``: reads an orbax
checkpoint directory (the trainer's ``checkpoint_{epoch}`` dirs, or a bare
param tree saved with ``save_params``) and writes a state-dict ``.pt`` the
reference loads via ``clip.load(..., jit=False)`` / ``build_model``
(`/root/reference/clip/clip.py:129-136`, `clip/model.py:405-443`).  Lets
TPU-fine-tuned models flow back to the torch ecosystem (WiSE-FT merging
against torch checkpoints, torch-side evaluation, deployment).

Usage: python -m tools.export_checkpoint CKPT_DIR OUT.pt
Round-trip bit-exactness + reference strict-load interop are pinned by
tests/test_convert_roundtrip.py.
"""

import argparse
import sys


def main(ckpt_dir: str, out_path: str) -> None:
    from flyp_tpu.models.convert import export_clip_state_dict, save_torch_checkpoint
    from flyp_tpu.utils.checkpoint import _checkpointer

    restored = _checkpointer().restore(ckpt_dir)
    if "params" in restored:  # full TrainState checkpoint
        params = restored["params"]
        batch_stats = restored.get("batch_stats") or None  # {} (ViT) -> None
    else:  # bare param tree (save_params)
        params, batch_stats = restored, None

    state = export_clip_state_dict(params, batch_stats)
    save_torch_checkpoint(out_path, state)
    print(f"exported {len(state)} tensors -> {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("ckpt_dir", help="orbax checkpoint directory (trainer checkpoint_{epoch})")
    p.add_argument("out_path", help="output .pt path")
    a = p.parse_args(sys.argv[1:])
    main(a.ckpt_dir, a.out_path)
