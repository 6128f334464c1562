/* Minimal CBLAS interface header for building the reference CP-CALS
 * (CALS_OPENBLAS branch, /root/reference/include/cals_blas.h:17-33) against
 * the OpenBLAS 0.3.27 bundled inside this environment's scipy wheel
 * (symbols exported with a `scipy_` prefix; see shim.c).
 *
 * Hand-written from the public CBLAS API specification — only the entry
 * points the reference actually calls (dgemm, dgemv, dtrsm, daxpy, dcopy,
 * dscal, dnrm2, dasum, idamax) plus the standard enums.
 */
#ifndef BASELINE_CBLAS_H
#define BASELINE_CBLAS_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;
typedef enum CBLAS_UPLO { CblasUpper = 121, CblasLower = 122 } CBLAS_UPLO;
typedef enum CBLAS_DIAG { CblasNonUnit = 131, CblasUnit = 132 } CBLAS_DIAG;
typedef enum CBLAS_SIDE { CblasLeft = 141, CblasRight = 142 } CBLAS_SIDE;

typedef int blasint;

double cblas_dnrm2(blasint n, const double *x, blasint incx);
double cblas_dasum(blasint n, const double *x, blasint incx);
size_t cblas_idamax(blasint n, const double *x, blasint incx);
void cblas_daxpy(blasint n, double alpha, const double *x, blasint incx,
                 double *y, blasint incy);
void cblas_dcopy(blasint n, const double *x, blasint incx, double *y,
                 blasint incy);
void cblas_dscal(blasint n, double alpha, double *x, blasint incx);
void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE trans, blasint m,
                 blasint n, double alpha, const double *a, blasint lda,
                 const double *x, blasint incx, double beta, double *y,
                 blasint incy);
void cblas_dgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE transa,
                 CBLAS_TRANSPOSE transb, blasint m, blasint n, blasint k,
                 double alpha, const double *a, blasint lda, const double *b,
                 blasint ldb, double beta, double *c, blasint ldc);
void cblas_dtrsm(CBLAS_ORDER order, CBLAS_SIDE side, CBLAS_UPLO uplo,
                 CBLAS_TRANSPOSE transa, CBLAS_DIAG diag, blasint m,
                 blasint n, double alpha, const double *a, blasint lda,
                 double *b, blasint ldb);

void openblas_set_num_threads(int n);
int openblas_get_num_threads(void);

#ifdef __cplusplus
}
#endif

#endif /* BASELINE_CBLAS_H */
