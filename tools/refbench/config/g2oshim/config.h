#ifndef G2O_CONFIG_H
#define G2O_CONFIG_H

/* hand-generated from /root/reference/Thirdparty/g2o/config.h.in:
   no OpenMP, static build */

#ifdef EIGEN_DEFAULT_TO_ROW_MAJOR
#  error "g2o requires column major Eigen matrices"
#endif

#endif
