#!/usr/bin/env python
"""Convert VGG16 + richzhang LPIPS calibration weights to the .npz layout
consumed by gsplat_tpu.ops.lpips (reference analogue: lpipsPyTorch downloads
torchvision + richzhang weights at import, modules/utils.py:11-30).

Two sources:
  - ``--vgg_pth`` / ``--lin_pth``: local torch state dicts — ``vgg_pth`` in
    torchvision VGG16 layout (``features.<idx>.weight/bias``; the 13 conv
    indices are 0,2,5,7,10,12,14,17,19,21,24,26,28) and ``lin_pth`` in
    richzhang layout (``lin<j>.model.1.weight``). Works with only torch
    installed.
  - no flags: torchvision download path (needs torchvision + network);
    run elsewhere, then ship the .npz and set GSPLAT_LPIPS_WEIGHTS.
"""
import argparse

import numpy as np

# torchvision VGG16 `features` Conv2d indices, in order.
VGG16_CONV_IDXS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_state_dicts(vgg_sd, lin_sd) -> dict:
    """torch state dicts → the flat npz dict ops/lpips.py loads."""
    out = {}
    for i, idx in enumerate(VGG16_CONV_IDXS):
        w = vgg_sd[f"features.{idx}.weight"]
        b = vgg_sd[f"features.{idx}.bias"]
        out[f"conv{i}_w"] = np.asarray(w.detach().cpu().numpy()
                                       if hasattr(w, "detach") else w)
        out[f"conv{i}_b"] = np.asarray(b.detach().cpu().numpy()
                                       if hasattr(b, "detach") else b)
    for j in range(5):
        w = lin_sd[f"lin{j}.model.1.weight"]
        w = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)
        out[f"lin{j}"] = w.squeeze()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    ap.add_argument("--vgg_pth", default="",
                    help="local torch state dict, torchvision VGG16 layout")
    ap.add_argument("--lin_pth", default="",
                    help="local torch state dict, richzhang LPIPS layout")
    args = ap.parse_args(argv)

    import torch
    if args.vgg_pth:
        vgg_sd = torch.load(args.vgg_pth, map_location="cpu",
                            weights_only=True)
        lin_sd = torch.load(args.lin_pth, map_location="cpu",
                            weights_only=True)
    else:
        import torchvision
        vgg_sd = torchvision.models.vgg16(
            weights="IMAGENET1K_V1").state_dict()
        url = ("https://raw.githubusercontent.com/richzhang/"
               "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")
        lin_sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    out = convert_state_dicts(vgg_sd, lin_sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
