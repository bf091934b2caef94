"""Device-side (jnp/Pallas) image ops.

TPU-native replacements for the reference's third-party native layer
(OpenCV / mahotas / scikit-image / scikit-learn — see SURVEY.md §2.b):
color conversion, tissue masking, morphology, thresholding, k-means,
connected components, SLIC, resize, and the overlap-add logit-canvas
stitcher. All ops are pure functions on jnp arrays, jit-compatible with
static shapes.
"""
