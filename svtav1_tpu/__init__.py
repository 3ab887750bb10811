"""svtav1_tpu — TPU-native AV1 encode/decode engine.

A brand-new AV1 encoder + decoder designed for TPU hardware (JAX/XLA/Pallas),
with the capabilities of SVT-AV1 v2.1.0 (reference surveyed in SURVEY.md):

- ``spec``    — normative AV1 constants & derivations (quant tables, CDFs,
                scan orders, block geometry).  Mirrors the *data* the reference
                keeps in Source/Lib/Common/Codec (EbCabacContextModel.c etc.).
- ``ops``     — batched integer-exact compute kernels (transforms, quant,
                intra/inter prediction, in-loop filters) in JAX + Pallas.
                Replaces the reference's ~234k-LoC RTCD SIMD backend
                (SURVEY.md §2.8) with ~30 batched kernel families.
- ``ec``      — multi-symbol arithmetic (range) entropy coding: Daala-style
                EC per AV1 spec, symbol tokenization, CDF contexts.
                (reference: Source/Lib/Common/Codec/EbBitstreamUnit.c,
                Source/Lib/Encoder/Codec/EbEntropyCoding.c)
- ``encoder`` — the host-orchestrated encode pipeline: the reference's 16
                pthread/SRM processes (SURVEY.md §2.3-2.4) become a dataflow
                of jitted stage functions over whole-frame tensors.
- ``decoder`` — research decoder: host OBU/symbol parse + device recon.
- ``utils``   — containers & IO (Y4M, IVF), bit writers, logging, config.
- ``parallel``— device mesh, shardings, collectives for multi-chip scale-out.
"""

__version__ = "0.1.0"
