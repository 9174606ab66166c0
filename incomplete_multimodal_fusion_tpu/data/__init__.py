import numpy as np

from . import synthetic, dfc2023, coco_instance, quadruplet, ade_odgt

__all__ = ["synthetic", "dfc2023", "coco_instance", "quadruplet", "ade_odgt",
           "patchify_batch"]


def patchify_batch(batch, patch_size: int):
    """Host-side patchify: {d: [B, H, W, C] float} -> {d: [B, N, p*p*C]}.

    Emits the MXU-ready patch-major layout (pixel order (ph, pw, c),
    ops.patches.patchify) straight from the loader, so the device step
    runs zero patchify transposes: PatchedInputAdapter consumes patches
    with one matmul and the patch-space losses use the target as-is
    (round-4 profile: ~0.5 ms/step of 6-D layout copies at the flagship
    shape). Integer semantic maps and already-patchified entries pass
    through unchanged.
    """
    p = patch_size
    out = {}
    for d, x in batch.items():
        if x.ndim == 4 and np.issubdtype(np.asarray(x).dtype, np.floating):
            b, h, w, c = x.shape
            nh, nw = h // p, w // p
            xp = np.asarray(x).reshape(b, nh, p, nw, p, c).transpose(0, 1, 3, 2, 4, 5)
            out[d] = np.ascontiguousarray(xp).reshape(b, nh * nw, p * p * c)
        else:
            out[d] = x
    return out
