// nanoGrid API-compatibility shim: SubmapGeometry.
//
// nanoGrid is fetched at reference build time and is NOT in the snapshot
// (/root/reference/fastdem/CMakeLists.txt:24-28); like nanogrid.hpp in
// this directory, this header is written from the call-site contract
// (fastdem/include/fastdem/bridge/ros2.hpp:39-46: construct from (map,
// center, length, ok&), expose getStartIndex()/getSize() of the clamped
// submap region), so the reference bridge headers compile for the
// golden generator. Semantics follow ETH grid_map's SubmapGeometry:
// the requested rectangle intersected with the map, in buffer indices.
#ifndef NANOGRID_SUBMAP_GEOMETRY_SHIM_HPP
#define NANOGRID_SUBMAP_GEOMETRY_SHIM_HPP

#include <algorithm>
#include <cmath>

#include <nanogrid/nanogrid.hpp>

namespace nanogrid {

class SubmapGeometry {
 public:
  template <typename MapT>
  SubmapGeometry(const MapT& map, const Position& center,
                 const Length& length, bool& ok) {
    const double res = map.getResolution();
    const auto size = map.getSize();
    const Position map_pos = map.getPosition();
    const double half_x = size(0) * res / 2.0;
    const double half_y = size(1) * res / 2.0;
    // Requested rectangle corners, clamped to the map bounds.
    const double req_xmax = center.x() + length.x() / 2.0;
    const double req_ymax = center.y() + length.y() / 2.0;
    const double xmax = std::min(req_xmax, map_pos.x() + half_x);
    const double ymax = std::min(req_ymax, map_pos.y() + half_y);
    const double xmin =
        std::max(center.x() - length.x() / 2.0, map_pos.x() - half_x);
    const double ymin =
        std::max(center.y() - length.y() / 2.0, map_pos.y() - half_y);
    if (xmin >= xmax || ymin >= ymax) {
      ok = false;
      start_.setZero();
      size_.setZero();
      return;
    }
    // Unwrapped (world-aligned) index of the max-x/max-y corner, then
    // rotated into the circular buffer via the start index.
    const auto start_idx = map.getStartIndex();
    const double origin_x = map_pos.x() + half_x;
    const double origin_y = map_pos.y() + half_y;
    int r0 = static_cast<int>(std::floor((origin_x - xmax) / res));
    int c0 = static_cast<int>(std::floor((origin_y - ymax) / res));
    r0 = std::max(0, std::min(r0, static_cast<int>(size(0)) - 1));
    c0 = std::max(0, std::min(c0, static_cast<int>(size(1)) - 1));
    int rows = static_cast<int>(std::ceil((xmax - xmin) / res));
    int cols = static_cast<int>(std::ceil((ymax - ymin) / res));
    rows = std::min(rows, static_cast<int>(size(0)) - r0);
    cols = std::min(cols, static_cast<int>(size(1)) - c0);
    start_ = Index((r0 + start_idx(0)) % size(0),
                   (c0 + start_idx(1)) % size(1));
    size_ = Size(rows, cols);
    ok = rows > 0 && cols > 0;
  }

  const Index& getStartIndex() const { return start_; }
  const Size& getSize() const { return size_; }

 private:
  Index start_;
  Size size_;
};

}  // namespace nanogrid

#endif  // NANOGRID_SUBMAP_GEOMETRY_SHIM_HPP
