"""Render the docs/performance.md pipeline table FROM the artifact.

The round-3 verdict flagged a docs-vs-artifact contradiction caused by
hand-synced numbers; this makes the table mechanically derivable:

    python benchmarks/table.py [PIPELINES_r04.json]

prints the markdown rows (best config per pipeline, descending) so the
docs table can be regenerated (or diffed) against the artifact at any time.
"""

from __future__ import annotations

import json
import sys

LABELS = {
    "fixed_sd_4mic": "fixed SD (4 mic)",
    "kws_fused_2mic": "**dual-mic KWS cleaner, fused kernel**",
    "enhance_fused_8mic": "enhance fused (8 mic)",
    "enhance_mega_8mic": "enhance mega (8 mic, flagship)",
    "binaural_2mic": "binaural coherence (2 mic)",
    "mccowan_4mic": "McCowan postfilter + DS (4 mic)",
    "enhance_pallas_8mic": "enhance pallas",
    "fdgsc_fused_4mic": "**FDGSC fused kernel (4 mic)**",
    "gsc_4mic": "**frequency GSC (4 mic)**",
    "kws_2mic": "dual-mic KWS cleaner (scan)",
    "wpe_2mic": "WPE dereverb (2 ch)",
    "tdgsc_fused_4mic": "**TDGSC fused kernel (4 mic)**",
    "full_stack_fused_4mic": "**full stack, 3 fused kernels (BASELINE cfg 5)**",
    "tdgsc_4mic": "TDGSC scan",
    "pmwf_4mic": "**PMWF (4 mic)**",
    "fdgsc_4mic": "FDGSC scan",
    "mvdr_8mic": "MVDR (8 mic, scan)",
    "subband_gsc_4mic": "**SubbandGSC (4 mic)**",
    "subband_gsc_fused_4mic": "**SubbandGSC fused kernel (McSpp in VMEM)**",
    "full_stack_4mic": "full stack scan",
    "srp_8mic": "SRP-PHAT DOA (8 mic)",
    "srp_fused_8mic": "**SRP-PHAT DOA, fused kernel**",
    "enhance_scan_8mic": "enhance scan",
    "dios_gsc_4mic": "dios_ssp GSC (4 mic)",
    "wpe_srp_fused_8mic": "**WPE -> SRP joint, fused SRP (cfg 4)**",
    "wpe_srp_8mic": "WPE -> SRP joint (8 mic, BASELINE cfg 4)",
}


def main(path: str = "PIPELINES_r04.json"):
    with open(path) as f:
        art = json.load(f)
    rows = []
    for name, e in art["pipelines"].items():
        if "audio_s_per_s" not in e:
            continue
        rows.append((e["audio_s_per_s"], name, e["batch"]))
    rows.sort(reverse=True)
    print("| pipeline | audio-s/s/chip | batch |")
    print("|---|---|---|")
    for v, name, batch in rows:
        label = LABELS.get(name, name)
        num = f"{v:,.0f}".replace(",", " ")
        num = f"**{num}**" if label.startswith("**") else num
        print(f"| {label} | {num} | {batch} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
