"""Generate the torch-checkpoint-import golden fixture.

Builds the REFERENCE StackedHourglass (models/pose/hourglass.py) on CPU with
a fixed seed, runs two train-mode forwards so BatchNorm running stats move
off their init values (making the batch_stats import observable), then saves
the state_dict + an eval-mode forward (preds, features) on a fixed input to
tests/goldens/torch_import_hg2.npz.

tests/test_torch_import.py asserts that importing this state_dict into our
flax StackedHourglass reproduces the same outputs.
"""
import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, "/root/reference")

from models.pose.hourglass import StackedHourglass  # noqa: E402

K, NSTACK, RES = 5, 2, 64


def main():
    torch.manual_seed(7)
    model = StackedHourglass(K, NSTACK, "AvgPool")
    model.train()
    with torch.no_grad():
        for s in (1, 2):   # move BN running stats off init
            torch.manual_seed(s)
            model(torch.rand(2, 3, RES, RES))
    model.eval()
    torch.manual_seed(99)
    x = torch.rand(2, 3, RES, RES)
    with torch.no_grad():
        preds, feats = model(x)

    out = {"input": x.numpy(),
           "preds": preds.numpy(),        # [B, S, K, H, W]
           "feats": feats.numpy(),        # [B, S, 256, h, w]
           "k": np.array(K), "n_stack": np.array(NSTACK)}
    for key, t in model.state_dict().items():
        out["sd::" + key] = t.numpy()
    path = os.path.join(REPO, "tests", "goldens", "torch_import_hg2.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays, "
          f"preds {preds.shape}, feats {feats.shape}")


if __name__ == "__main__":
    main()
