// Minimal fftw3f API shim so the reference's OfdmGenerator.h/.cpp compile
// without FFTW.  Only OfdmGeneratorFixed (the KISS int16 path) is
// instantiated by the golden harness; the CF32 path's fftwf_* calls link
// against aborting stubs in golden_stubs.cpp.
#pragma once
#include <cstddef>

typedef float fftwf_complex[2];
typedef struct fftwf_plan_s* fftwf_plan;

#define FFTW_FORWARD (-1)
#define FFTW_BACKWARD (+1)
#define FFTW_MEASURE (0U)

extern "C" {
void* fftwf_malloc(size_t n);
void fftwf_free(void* p);
fftwf_plan fftwf_plan_dft_1d(int n, fftwf_complex* in, fftwf_complex* out,
                             int sign, unsigned flags);
void fftwf_destroy_plan(fftwf_plan p);
void fftwf_execute(const fftwf_plan p);
void fftwf_set_timelimit(double t);
}
