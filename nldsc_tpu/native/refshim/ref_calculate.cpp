// extern "C" wrapper around the REFERENCE LD kernel, compiled read-only
// from /root/reference/nldsc/ldscore/_ldscore/ldscalc.h:8-65 (which pulls
// in stream.h, encoder.h, tools.h, data.h) against the minimal Armadillo
// shim in ./armadillo and the no-op progress bar in ./indicators_stub.h.
//
// None of the reference's code lives in this repository — the build
// includes it from the mounted reference tree (see Makefile REF_DIR).
// This exists solely so tests/test_reference_binary.py can assert
// executed-vs-executed parity (oracle + every engine vs the reference's
// actual C++ semantics, including the all-missing poison path,
// encoder.h:99-122 -> ldscalc.h:36-46).
#include <algorithm>
#include <cstdio>
#include <string>
#include <vector>

#include "ldscalc.h" // reference header, found via -I $(REF_DIR)

extern "C" int nldsc_ref_calculate(
    const char* bedfile,
    int n_snp,
    int n_org,
    double ld_wind,
    double maf,
    double std_thr,
    double rsq_thr,
    const double* positions,
    double* l2_out,
    double* l2d_out,
    double* maf_out,
    double* rstd_out,
    int* l2_ws_out,
    int* l2d_ws_out,
    int* l2d_wse_out,
    char* err,
    int errlen)
{
    try {
        LDScoreParams params(
            std::string(bedfile), n_snp, n_org, ld_wind, maf, std_thr, rsq_thr,
            std::vector<double>(positions, positions + n_snp));
        LDScoreResult res = calculate(params);
        std::copy(res.l2.begin(), res.l2.end(), l2_out);
        std::copy(res.l2d.begin(), res.l2d.end(), l2d_out);
        std::copy(res.maf.begin(), res.maf.end(), maf_out);
        std::copy(res.residuals_std.begin(), res.residuals_std.end(), rstd_out);
        std::copy(res.l2_ws.begin(), res.l2_ws.end(), l2_ws_out);
        std::copy(res.l2d_ws.begin(), res.l2d_ws.end(), l2d_ws_out);
        std::copy(res.l2d_wse.begin(), res.l2d_wse.end(), l2d_wse_out);
        return 0;
    } catch (const std::exception& e) {
        if (err && errlen > 0) std::snprintf(err, errlen, "%s", e.what());
        return 1;
    } catch (...) {
        if (err && errlen > 0) std::snprintf(err, errlen, "unknown C++ exception");
        return 2;
    }
}
