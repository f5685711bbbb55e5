#!/usr/bin/env python
"""Convert torchvision VGG16 + richzhang LPIPS weights to the .npz layout
consumed by gsplat_tpu.ops.lpips (run on a machine with network access,
then ship the .npz and set GSPLAT_LPIPS_WEIGHTS)."""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    import torchvision
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    i = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{i}_w"] = layer.weight.detach().numpy()
            out[f"conv{i}_b"] = layer.bias.detach().numpy()
            i += 1
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")
    lin = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    for j in range(5):
        out[f"lin{j}"] = lin[f"lin{j}.model.1.weight"].squeeze().numpy()
    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
