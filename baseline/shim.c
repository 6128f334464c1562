/* Forwarding shim: unprefixed CBLAS/LAPACK entry points -> the `scipy_`-
 * prefixed symbols exported by scipy's bundled OpenBLAS 0.3.27
 * (/opt/venv/.../scipy.libs/libscipy_openblas-*.so, LP64 interface).
 *
 * This lets the unmodified reference CP-CALS sources (which call plain
 * cblas_* / dposv_ / dpotrf_, include/cals_blas.h:17-55) link against a
 * real optimized BLAS on this host instead of netlib libblas.
 *
 * NOTE on dposv_/dpotrf_: the reference's OPENBLAS branch declares them
 * with `long int*` arguments (cals_blas.h:24-33) while LP64 OpenBLAS reads
 * 32-bit ints. The shim accepts long* and narrows explicitly, making the
 * ABI mismatch well-defined (all dimensions here are tiny).
 */
#include "cblas.h"

/* scipy-prefixed externs (LP64: 32-bit lapack ints) */
extern double scipy_cblas_dnrm2(blasint, const double *, blasint);
extern double scipy_cblas_dasum(blasint, const double *, blasint);
extern size_t scipy_cblas_idamax(blasint, const double *, blasint);
extern void scipy_cblas_daxpy(blasint, double, const double *, blasint,
                              double *, blasint);
extern void scipy_cblas_dcopy(blasint, const double *, blasint, double *,
                              blasint);
extern void scipy_cblas_dscal(blasint, double, double *, blasint);
extern void scipy_cblas_dgemv(CBLAS_ORDER, CBLAS_TRANSPOSE, blasint, blasint,
                              double, const double *, blasint, const double *,
                              blasint, double, double *, blasint);
extern void scipy_cblas_dgemm(CBLAS_ORDER, CBLAS_TRANSPOSE, CBLAS_TRANSPOSE,
                              blasint, blasint, blasint, double,
                              const double *, blasint, const double *, blasint,
                              double, double *, blasint);
extern void scipy_cblas_dtrsm(CBLAS_ORDER, CBLAS_SIDE, CBLAS_UPLO,
                              CBLAS_TRANSPOSE, CBLAS_DIAG, blasint, blasint,
                              double, const double *, blasint, double *,
                              blasint);
extern void scipy_dposv_(const char *, const int *, const int *, double *,
                         const int *, double *, const int *, int *);
extern void scipy_dpotrf_(const char *, const int *, double *, const int *,
                          int *);
extern void scipy_openblas_set_num_threads(int);
extern int scipy_openblas_get_num_threads(void);

double cblas_dnrm2(blasint n, const double *x, blasint incx) {
  return scipy_cblas_dnrm2(n, x, incx);
}
double cblas_dasum(blasint n, const double *x, blasint incx) {
  return scipy_cblas_dasum(n, x, incx);
}
size_t cblas_idamax(blasint n, const double *x, blasint incx) {
  return scipy_cblas_idamax(n, x, incx);
}
void cblas_daxpy(blasint n, double alpha, const double *x, blasint incx,
                 double *y, blasint incy) {
  scipy_cblas_daxpy(n, alpha, x, incx, y, incy);
}
void cblas_dcopy(blasint n, const double *x, blasint incx, double *y,
                 blasint incy) {
  scipy_cblas_dcopy(n, x, incx, y, incy);
}
void cblas_dscal(blasint n, double alpha, double *x, blasint incx) {
  scipy_cblas_dscal(n, alpha, x, incx);
}
void cblas_dgemv(CBLAS_ORDER order, CBLAS_TRANSPOSE trans, blasint m,
                 blasint n, double alpha, const double *a, blasint lda,
                 const double *x, blasint incx, double beta, double *y,
                 blasint incy) {
  scipy_cblas_dgemv(order, trans, m, n, alpha, a, lda, x, incx, beta, y, incy);
}
void cblas_dgemm(CBLAS_ORDER order, CBLAS_TRANSPOSE transa,
                 CBLAS_TRANSPOSE transb, blasint m, blasint n, blasint k,
                 double alpha, const double *a, blasint lda, const double *b,
                 blasint ldb, double beta, double *c, blasint ldc) {
  scipy_cblas_dgemm(order, transa, transb, m, n, k, alpha, a, lda, b, ldb,
                    beta, c, ldc);
}
void cblas_dtrsm(CBLAS_ORDER order, CBLAS_SIDE side, CBLAS_UPLO uplo,
                 CBLAS_TRANSPOSE transa, CBLAS_DIAG diag, blasint m, blasint n,
                 double alpha, const double *a, blasint lda, double *b,
                 blasint ldb) {
  scipy_cblas_dtrsm(order, side, uplo, transa, diag, m, n, alpha, a, lda, b,
                    ldb);
}

/* Reference declares these with long* args (cals_blas.h:24-33); narrow to
 * the LP64 ints the library reads. */
void dposv_(const char *uplo, const long *n, const long *nrhs, double *a,
            const long *lda, double *b, const long *ldb, long *info) {
  int n32 = (int)*n, nrhs32 = (int)*nrhs, lda32 = (int)*lda, ldb32 = (int)*ldb;
  int info32 = 0;
  scipy_dposv_(uplo, &n32, &nrhs32, a, &lda32, b, &ldb32, &info32);
  *info = info32;
}
void dpotrf_(const char *uplo, const long *n, double *a, const long *lda,
             long *info) {
  int n32 = (int)*n, lda32 = (int)*lda;
  int info32 = 0;
  scipy_dpotrf_(uplo, &n32, a, &lda32, &info32);
  *info = info32;
}

void openblas_set_num_threads(int n) { scipy_openblas_set_num_threads(n); }
int openblas_get_num_threads(void) {
  return scipy_openblas_get_num_threads();
}
