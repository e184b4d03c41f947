#!/usr/bin/env python3
"""Generate the Wan-VACE outpainting example workflows.

Mirrors the node-graph shape of the two reference examples
(/root/reference/example_workflows/Wan2.1_VACE_outpainting_VideoStabilizer.json
and Wan2.2-VACE-Fun_outpainting_VideoStabilizer.json): load video ->
scale -> video_stabilizer_flow (crop_and_pad) -> resize frames+padding
mask -> GrowMask -> WanVaceToVideo outpaint -> sampling -> VAEDecode ->
VideoCombine, with the stabilizer's padding_mask steering the VACE
control masks.  The Wan2.1 variant samples with a single KSampler on
the 14B VACE model; the Wan2.2-Fun variant runs the two-stage
high-noise/low-noise VACE-Fun pair with chained KSamplerAdvanced
nodes.  Written as a generator so link bookkeeping stays consistent;
the JSON artifacts are committed alongside.
"""

import json
import os

NODES = []
LINKS = []  # [id, from_node, from_slot, to_node, to_slot, type]


def node(nid, ntype, pos, size, inputs, outputs, widgets=None, order=0, title=None):
    n = {
        "id": nid,
        "type": ntype,
        "pos": list(pos),
        "size": list(size),
        "flags": {},
        "order": order,
        "mode": 0,
        "inputs": [
            {"name": name, "type": t, "link": None} for name, t in inputs
        ],
        "outputs": [
            {"name": name, "type": t, "links": []} for name, t in outputs
        ],
        "properties": {},
    }
    if widgets is not None:
        n["widgets_values"] = widgets
    if title:
        n["title"] = title
    NODES.append(n)
    return n


def link(src, src_slot, dst, dst_slot, ltype):
    lid = len(LINKS) + 1
    LINKS.append([lid, src["id"], src_slot, dst["id"], dst_slot, ltype])
    src["outputs"][src_slot]["links"].append(lid)
    dst["inputs"][dst_slot]["link"] = lid
    return lid


def build(variant):
    NODES.clear()
    LINKS.clear()

    load = node(1, "VHS_LoadVideo", (-700, 0), (240, 300),
                [("meta_batch", "VHS_BatchManager"), ("vae", "VAE")],
                [("IMAGE", "IMAGE"), ("frame_count", "INT"), ("audio", "AUDIO"),
                 ("video_info", "VHS_VIDEOINFO")],
                {"video": "input_shaky.mp4", "force_rate": 16, "custom_width": 0,
                 "custom_height": 0, "frame_load_cap": 81, "skip_first_frames": 0,
                 "select_every_nth": 1})
    scale = node(2, "ImageScaleToTotalPixels", (-420, 0), (240, 80),
                 [("image", "IMAGE")], [("IMAGE", "IMAGE")],
                 ["lanczos", 0.4])
    stab = node(3, "video_stabilizer_flow", (-150, 0), (320, 220),
                [("frames", "IMAGE")],
                [("frames_stabilized", "IMAGE"), ("padding_mask", "MASK"),
                 ("meta", "JSON")],
                ["crop_and_pad", "similarity", False, 0.7, 0.5, 0.6, "#7F7F7F"])
    resize = node(4, "ImageResizeKJv2", (210, 0), (260, 240),
                  [("image", "IMAGE"), ("mask", "MASK")],
                  [("IMAGE", "IMAGE"), ("width", "INT"), ("height", "INT"),
                   ("mask", "MASK")],
                  [0, 0, "nearest-exact", "crop", "0, 0, 0", "center", 16, "cpu"])
    preview = node(5, "PreviewImage", (210, 300), (210, 250), [("images", "IMAGE")], [])
    grow = node(6, "GrowMask", (520, 220), (210, 100),
                [("mask", "MASK")], [("MASK", "MASK")], [5, True])
    clip_loader = node(7, "CLIPLoader", (-150, 420), (320, 90),
                       [], [("CLIP", "CLIP")],
                       ["umt5_xxl_fp8_e4m3fn_scaled.safetensors", "wan", "default"])
    pos = node(8, "CLIPTextEncode", (210, 420), (300, 120),
               [("clip", "CLIP")], [("CONDITIONING", "CONDITIONING")],
               ["steady cinematic footage, consistent background"],
               title="CLIP Text Encode (Positive)")
    neg = node(9, "CLIPTextEncode", (210, 580), (300, 120),
               [("clip", "CLIP")], [("CONDITIONING", "CONDITIONING")],
               ["overexposure, static, blurred details, worst quality"],
               title="CLIP Text Encode (Negative)")
    vae_loader = node(10, "VAELoader", (-150, 720), (300, 60),
                      [], [("VAE", "VAE")], ["wan_2.1_vae.safetensors"])
    vace = node(11, "WanVaceToVideo", (560, 420), (270, 260),
                [("positive", "CONDITIONING"), ("negative", "CONDITIONING"),
                 ("vae", "VAE"), ("control_video", "IMAGE"),
                 ("control_masks", "MASK"), ("reference_image", "IMAGE"),
                 ("width", "INT"), ("height", "INT")],
                [("positive", "CONDITIONING"), ("negative", "CONDITIONING"),
                 ("trim_latent", "INT"), ("latent", "LATENT")],
                [480, 832, 81, 1, 1])

    if variant == "wan21":
        unet = node(12, "UNETLoader", (-150, 850), (320, 90),
                    [], [("MODEL", "MODEL")],
                    ["wan2.1_vace_14B_fp16.safetensors", "default"])
        msd3 = node(13, "ModelSamplingSD3", (210, 850), (240, 70),
                    [("model", "MODEL")], [("MODEL", "MODEL")], [8])
        tam = node(14, "UNetTemporalAttentionMultiply", (480, 850), (260, 130),
                   [("model", "MODEL")], [("MODEL", "MODEL")], [1, 1, 1.1, 1])
        cfg0 = node(15, "CFGZeroStar", (770, 850), (210, 60),
                    [("model", "MODEL")], [("MODEL", "MODEL")])
        ks = node(16, "KSampler", (870, 420), (270, 280),
                  [("model", "MODEL"), ("positive", "CONDITIONING"),
                   ("negative", "CONDITIONING"), ("latent_image", "LATENT")],
                  [("LATENT", "LATENT")],
                  [3, "fixed", 4, 1, "uni_pc", "simple", 1])
        decode_id, combine_id, note_id = 17, 18, 19
        link(unet, 0, msd3, 0, "MODEL")
        link(msd3, 0, tam, 0, "MODEL")
        link(tam, 0, cfg0, 0, "MODEL")
        link(cfg0, 0, ks, 0, "MODEL")
        link(vace, 0, ks, 1, "CONDITIONING")
        link(vace, 1, ks, 2, "CONDITIONING")
        link(vace, 3, ks, 3, "LATENT")
        sampler_out = ks
        note_text = (
            "## Stabilize + VACE outpainting (Wan2.1)\n\n"
            "`video_stabilizer_flow` in **crop_and_pad** framing keeps the\n"
            "full field of view and emits a `padding_mask` marking the\n"
            "empty border it introduced.  The mask (grown by 5 px) drives\n"
            "Wan2.1-VACE outpainting so the model fills exactly the\n"
            "stabilization padding.  Attach `meta.motion_meta` to\n"
            "`video_stabilizer_motion_apply` afterwards to re-impose or\n"
            "invert the motion on the outpainted frames."
        )
        wf_id = "cvst-tpu-wan21-vace-outpaint"
        fname = "Wan2.1_VACE_outpainting_VideoStabilizer.json"
    else:
        # Wan2.2-Fun: high-noise model samples steps 0..4, the low-noise
        # model takes over for the remainder (chained KSamplerAdvanced,
        # leftover noise passed through)
        unet_hi = node(12, "UNETLoader", (-150, 850), (340, 90),
                       [], [("MODEL", "MODEL")],
                       ["wan2.2_fun_vace_high_noise_14B_fp8_scaled.safetensors",
                        "fp8_e4m3fn"], title="Load High-Noise Model")
        unet_lo = node(13, "UNETLoader", (-150, 970), (340, 90),
                       [], [("MODEL", "MODEL")],
                       ["wan2.2_fun_vace_low_noise_14B_fp8_scaled.safetensors",
                        "fp8_e4m3fn"], title="Load Low-Noise Model")
        msd3_hi = node(14, "ModelSamplingSD3", (230, 850), (240, 70),
                       [("model", "MODEL")], [("MODEL", "MODEL")], [8])
        msd3_lo = node(15, "ModelSamplingSD3", (230, 970), (240, 70),
                       [("model", "MODEL")], [("MODEL", "MODEL")], [8])
        ks_hi = node(16, "KSamplerAdvanced", (870, 420), (280, 320),
                     [("model", "MODEL"), ("positive", "CONDITIONING"),
                      ("negative", "CONDITIONING"), ("latent_image", "LATENT")],
                     [("LATENT", "LATENT")],
                     ["enable", 3, "fixed", 20, 4, "euler", "simple", 0, 4,
                      "enable"], title="KSampler (High Noise, steps 0-4)")
        ks_lo = node(17, "KSamplerAdvanced", (1180, 420), (280, 320),
                     [("model", "MODEL"), ("positive", "CONDITIONING"),
                      ("negative", "CONDITIONING"), ("latent_image", "LATENT")],
                     [("LATENT", "LATENT")],
                     ["disable", 0, "fixed", 20, 3, "euler", "simple", 4, 9999,
                      "disable"], title="KSampler (Low Noise, steps 4+)")
        decode_id, combine_id, note_id = 18, 19, 20
        link(unet_hi, 0, msd3_hi, 0, "MODEL")
        link(unet_lo, 0, msd3_lo, 0, "MODEL")
        link(msd3_hi, 0, ks_hi, 0, "MODEL")
        link(msd3_lo, 0, ks_lo, 0, "MODEL")
        link(vace, 0, ks_hi, 1, "CONDITIONING")
        link(vace, 1, ks_hi, 2, "CONDITIONING")
        link(vace, 3, ks_hi, 3, "LATENT")
        link(vace, 0, ks_lo, 1, "CONDITIONING")
        link(vace, 1, ks_lo, 2, "CONDITIONING")
        link(ks_hi, 0, ks_lo, 3, "LATENT")
        sampler_out = ks_lo
        note_text = (
            "## Stabilize + VACE-Fun outpainting (Wan2.2)\n\n"
            "Same stabilize -> mask -> outpaint recipe as the Wan2.1\n"
            "workflow, sampled with the Wan2.2-Fun high-noise/low-noise\n"
            "model pair: the high-noise VACE model runs the first 4\n"
            "steps, the low-noise model finishes the schedule (leftover\n"
            "noise chained through KSamplerAdvanced).  The stabilizer's\n"
            "`padding_mask` (grown by 5 px) again tells VACE exactly\n"
            "which border pixels to synthesize."
        )
        wf_id = "cvst-tpu-wan22-fun-vace-outpaint"
        fname = "Wan2.2-VACE-Fun_outpainting_VideoStabilizer.json"

    decode = node(decode_id, "VAEDecode", (1500, 420), (190, 70),
                  [("samples", "LATENT"), ("vae", "VAE")], [("IMAGE", "IMAGE")])
    combine = node(combine_id, "VHS_VideoCombine", (1720, 420), (300, 320),
                   [("images", "IMAGE"), ("audio", "AUDIO"),
                    ("meta_batch", "VHS_BatchManager"), ("vae", "VAE")],
                   [("Filenames", "VHS_FILENAMES")],
                   {"frame_rate": 16, "loop_count": 0,
                    "filename_prefix": "stabilized_outpaint", "format": "video/h264-mp4",
                    "pix_fmt": "yuv420p", "crf": 19, "save_metadata": True,
                    "trim_to_audio": False, "pingpong": False, "save_output": True})
    node(note_id, "MarkdownNote", (-700, 420), (480, 330), [], [],
         [note_text], title="About this workflow")

    link(load, 0, scale, 0, "IMAGE")
    link(scale, 0, stab, 0, "IMAGE")
    link(stab, 0, resize, 0, "IMAGE")
    link(stab, 1, resize, 1, "MASK")
    link(resize, 0, preview, 0, "IMAGE")
    link(resize, 0, vace, 3, "IMAGE")
    link(resize, 3, grow, 0, "MASK")
    link(grow, 0, vace, 4, "MASK")
    link(resize, 1, vace, 6, "INT")
    link(resize, 2, vace, 7, "INT")
    link(clip_loader, 0, pos, 0, "CLIP")
    link(clip_loader, 0, neg, 0, "CLIP")
    link(pos, 0, vace, 0, "CONDITIONING")
    link(neg, 0, vace, 1, "CONDITIONING")
    link(vae_loader, 0, vace, 2, "VAE")
    link(sampler_out, 0, decode, 0, "LATENT")
    link(vae_loader, 0, decode, 1, "VAE")
    link(decode, 0, combine, 0, "IMAGE")

    for order, n in enumerate(NODES):
        n["order"] = order

    doc = {
        "id": wf_id,
        "revision": 0,
        "last_node_id": max(n["id"] for n in NODES),
        "last_link_id": len(LINKS),
        "nodes": [dict(n) for n in NODES],
        "links": list(LINKS),
        "groups": [],
        "config": {},
        "extra": {},
        "version": 0.4,
    }
    out = os.path.join(os.path.dirname(__file__), os.pardir, "example_workflows", fname)
    with open(os.path.abspath(out), "w") as f:
        json.dump(doc, f, indent=2)
    print("wrote", os.path.abspath(out))


def main():
    build("wan21")
    build("wan22fun")


if __name__ == "__main__":
    main()
