"""tpuslam — a TPU-native visual SLAM engine with the capabilities of ORB-SLAM2.

Re-designed array-first for JAX/XLA/Pallas rather than ported from the
reference C++ (see /root/reference, surveyed in SURVEY.md):

- ``geometry``  : SE3/Sim3 Lie groups, camera models, triangulation.
- ``ops``       : the image front end (pyramid, FAST, orientation, rBRIEF)
                  as batched JAX / Pallas kernels.
- ``matching``  : 256-bit Hamming matching kernels and all search modes of
                  the reference's ORBmatcher.
- ``optim``     : batched Gauss-Newton/LM — pose optimization, local/global
                  bundle adjustment with Schur complement, Sim3, pose graph.
- ``mapstate``  : the functional map — fixed-capacity SoA arrays (keyframes,
                  map points, observations, covisibility) updated by pure
                  functions; replaces the reference's mutex pointer graph.
- ``place``     : binary-descriptor vocabulary + BoW inverted index
                  (DBoW2-class place recognition).
- ``pipeline``  : tracking / local mapping / loop closing orchestration and
                  the public System facade.
- ``parallel``  : device-mesh sharding of BA and the map (pjit/shard_map).
- ``io``        : dataset readers (TUM/KITTI/EuRoC), YAML settings,
                  trajectory export.
"""

__version__ = "0.1.0"
