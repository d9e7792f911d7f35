// Test tool: print the reference's integer subMatrix (2-bit, bias 0)
// for a matrix file, to validate data/submat_file.py.
#include <cstdio>
#include "SubstitutionMatrix.h"
int main(int argc, char **argv) {
    SubstitutionMatrix m(argv[1], 2.0, 0.0f);
    for (int i = 0; i < m.alphabetSize; i++) {
        for (int j = 0; j < m.alphabetSize; j++)
            printf("%d ", m.subMatrix[i][j]);
        printf("\n");
    }
    return 0;
}
