// Shim: the reference includes <nanogrid/GridMapMath.hpp> but uses no
// symbols from it in the sources compiled here (the DDA does its own
// coordinate math, src/raycasting.cpp:60-117).
#ifndef NANOGRID_GRIDMAPMATH_COMPAT_HPP
#define NANOGRID_GRIDMAPMATH_COMPAT_HPP
#include <nanogrid/nanogrid.hpp>
#endif
