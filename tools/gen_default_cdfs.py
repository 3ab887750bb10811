#!/usr/bin/env python3
"""Dev-time tool: extract the normative AV1 default CDF tables into
svtav1_tpu/spec/data/default_cdfs.npz.

The default CDFs are interoperability constants fixed by the AV1 spec
(§5.9.16 / Default CDF Tables).  We obtain them by calling the reference's
svt_aom_init_mode_probs() on a zeroed FRAME_CONTEXT and slicing fields by
offsetof — avoiding hand-transcription of ~10k numbers.

Each npz entry is a uint16 array shaped per its context dims, with the last
axis = CDF_SIZE(nsyms) = nsyms icdf entries (icdf[nsyms-1]==0) + 1 counter.
"""

import re
import subprocess
from pathlib import Path

import numpy as np

TMP = Path("/tmp/oracle")
R = "/root/reference/Source/Lib"
HDR = Path(f"{R}/Common/Codec/EbCabacContextModel.h")
OUT = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data/default_cdfs.npz"

FIELDS = """txb_skip_cdf eob_extra_cdf dc_sign_cdf eob_flag_cdf16 eob_flag_cdf32
eob_flag_cdf64 eob_flag_cdf128 eob_flag_cdf256 eob_flag_cdf512 eob_flag_cdf1024
coeff_base_eob_cdf coeff_base_cdf coeff_br_cdf newmv_cdf zeromv_cdf refmv_cdf
drl_cdf inter_compound_mode_cdf compound_type_cdf wedge_idx_cdf interintra_cdf
wedge_interintra_cdf interintra_mode_cdf motion_mode_cdf obmc_cdf
palette_y_size_cdf palette_uv_size_cdf palette_y_color_index_cdf
palette_uv_color_index_cdf palette_y_mode_cdf palette_uv_mode_cdf
comp_inter_cdf single_ref_cdf comp_ref_type_cdf uni_comp_ref_cdf comp_ref_cdf
comp_bwdref_cdf txfm_partition_cdf compound_index_cdf comp_group_idx_cdf
skip_mode_cdfs skip_cdfs intra_inter_cdf intrabc_cdf filter_intra_cdfs
filter_intra_mode_cdf switchable_restore_cdf wiener_restore_cdf ccso_cdf
sgrproj_restore_cdf y_mode_cdf uv_mode_cdf partition_cdf
switchable_interp_cdf kf_y_cdf angle_delta_cdf tx_size_cdf delta_q_cdf
delta_lf_multi_cdf delta_lf_cdf intra_ext_tx_cdf inter_ext_tx_cdf cfl_sign_cdf
cfl_alpha_cdf nmvc ndvc seg""".split()

SHIM_TOP = r"""
#include <stdio.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>
#include "EbCabacContextModel.h"

void (*svt_memcpy)(void *dst, void const *src, size_t size) = 0;
void svt_memcpy_c(void *dst, void const *src, size_t size) { memcpy(dst, src, size); }

int main(void) {
    svt_memcpy = (void (*)(void *, void const *, size_t))memcpy;
    FRAME_CONTEXT *fc = calloc(1, sizeof(FRAME_CONTEXT));
    svt_aom_init_mode_probs(fc);
    /* coefficient CDF defaults are qindex-class dependent (4 classes) */
    int qreps[4] = {10, 40, 90, 140};
    for (int i = 0; i < 4; i++) {
        char path[64];
        svt_av1_default_coef_probs(fc, qreps[i]);
        snprintf(path, sizeof(path), "/tmp/oracle/fc_dump_q%d.bin", i);
        FILE *f = fopen(path, "wb");
        fwrite(fc, 1, sizeof(*fc), f);
        fclose(f);
    }
"""


def main():
    TMP.mkdir(exist_ok=True)
    shim = SHIM_TOP
    for f in FIELDS:
        shim += (f'    printf("{f} %zu %zu\\n", offsetof(FRAME_CONTEXT, {f}),'
                 f' sizeof(fc->{f}));\n')
    shim += '    printf("TOTAL %zu 0\\n", sizeof(FRAME_CONTEXT));\n'
    shim += "    return 0;\n}\n"
    (TMP / "cdf_shim.c").write_text(shim)
    subprocess.run(
        f"gcc -O2 -I{R}/Common/Codec -I/root/reference/Source/API "
        f"-o {TMP}/cdf_dump {TMP}/cdf_shim.c "
        f"{R}/Common/Codec/EbCabacContextModel.c", shell=True, check=True)
    layout = subprocess.run([str(TMP / "cdf_dump")], capture_output=True,
                            text=True, check=True).stdout
    raws = [np.fromfile(TMP / f"fc_dump_q{i}.bin", np.uint8) for i in range(4)]
    raw = raws[0]

    # parse declared dims from the header text for shaping
    text = HDR.read_text()
    dims = {}
    for m in re.finditer(r"AomCdfProb\s+(\w+)((?:\[[^\]]+\])+);", text):
        name = m.group(1)
        dims[name] = re.findall(r"\[([^\]]+)\]", m.group(2))

    # macro values needed to resolve dims — print them via the compiler
    macros = sorted({tok for d in dims.values() for tok in
                     re.findall(r"[A-Za-z_][A-Za-z_0-9]*", " ".join(d))
                     if not tok.isdigit() and tok != "CDF_SIZE"})
    mshim = ('#include <stdio.h>\n#include "EbCabacContextModel.h"\n'
             "int main(void){\n")
    for mname in macros:
        mshim += f'    printf("{mname} %d\\n", (int)({mname}));\n'
    mshim += "    return 0;\n}\n"
    (TMP / "macro_shim.c").write_text(mshim)
    subprocess.run(
        f"gcc -O2 -I{R}/Common/Codec -I/root/reference/Source/API "
        f"-o {TMP}/macro_dump {TMP}/macro_shim.c", shell=True, check=True)
    mvals = dict((l.split()[0], int(l.split()[1])) for l in subprocess.run(
        [str(TMP / "macro_dump")], capture_output=True, text=True,
        check=True).stdout.splitlines())

    def resolve(expr):
        e = expr
        cm = re.match(r"CDF_SIZE\((.*)\)$", e)
        if cm:
            return resolve(cm.group(1)) + 1
        for k, v in sorted(mvals.items(), key=lambda kv: -len(kv[0])):
            e = re.sub(rf"\b{k}\b", str(v), e)
        return int(eval(e))

    out = {}
    for line in layout.splitlines():
        name, off, size = line.split()
        off, size = int(off), int(size)
        if name in ("TOTAL", "nmvc", "ndvc", "seg"):
            if name != "TOTAL":
                out[f"raw_{name}"] = raw[off:off + size].view(np.uint16).copy()
            continue
        shape = tuple(resolve(d) for d in dims[name])
        coef_fields = {"txb_skip_cdf", "eob_extra_cdf", "dc_sign_cdf",
                       "coeff_base_eob_cdf", "coeff_base_cdf", "coeff_br_cdf"}
        is_coef = name in coef_fields or name.startswith("eob_flag_cdf")
        if is_coef:
            out[name] = np.stack([r[off:off + size].view(np.uint16)
                                  .reshape(shape) for r in raws])
        else:
            out[name] = raw[off:off + size].view(np.uint16).reshape(shape).copy()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: {len(out)} tables")
    print("partition_cdf shape", out["partition_cdf"].shape,
          "kf_y_cdf", out["kf_y_cdf"].shape,
          "coeff_base_cdf", out["coeff_base_cdf"].shape)


if __name__ == "__main__":
    main()
