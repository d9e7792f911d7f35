// Test-infrastructure tool (not shipped): prints the 12 ALP Gumbel
// parameters the reference's EvalueComputation would fit at runtime for
// a given (substitution matrix file, gap open, gap extend), by calling
// the vendored ALP library from the reference build.  Used once to
// generate tolerance goldens for metaeuk_tpu/search/gumbel.py; also
// demonstrates ALP's wall-clock-dependent realization sizing (run it
// twice and compare).
#include <cstdio>
#include <cstdlib>
#include "SubstitutionMatrix.h"
#include "sls_alignment_evaluer.hpp"

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s matrix.out gapOpen gapExtend\n", argv[0]);
        return 1;
    }
    SubstitutionMatrix subMat(argv[1], 2.0, 0.0f);
    int gapOpen = atoi(argv[2]);
    int gapExtend = atoi(argv[3]);
    long **tmpMat = new long *[subMat.alphabetSize];
    long *tmpMatData = new long[subMat.alphabetSize * subMat.alphabetSize];
    for (int i = 0; i < subMat.alphabetSize; i++) {
        tmpMat[i] = &tmpMatData[i * subMat.alphabetSize];
        for (int j = 0; j < subMat.alphabetSize; j++) {
            tmpMat[i][j] = subMat.subMatrix[i][j];
        }
    }
    Sls::AlignmentEvaluer evaluer;
    evaluer.initGapped(subMat.alphabetSize - 1, (const long *const *)tmpMat,
                       subMat.pBack, subMat.pBack,
                       gapOpen, gapExtend, gapOpen, gapExtend,
                       false, 0.01, 0.05, 60.0, 500, 42);
    const Sls::ALP_set_of_parameters &p = evaluer.parameters();
    printf("%.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g %.17g "
           "%.17g %.17g\n",
           p.lambda, p.K, p.a_J, p.b_J, p.a_I, p.b_I,
           p.alpha_J, p.beta_J, p.alpha_I, p.beta_I, p.sigma, p.tau);
    return 0;
}
