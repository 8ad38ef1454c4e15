// Golden-output generator: compiles the REFERENCE FastDEM C++ sources
// (read in place from /root/reference — never copied) against the
// nanogrid compatibility layer in this directory, runs the reference
// pipeline on scan/pose streams produced by the Python test, and writes
// the resulting map as .npz for numerical comparison against fastdem_tpu
// (tests/test_reference_goldens.py). This realizes the "goldens vs the
// real reference" validation SURVEY.md §4 calls out as the missing piece.
//
// Input protocol (little-endian, written by the Python side):
//   scans.bin : int32 K, int32 N, then K*N*3 float32 sensor-frame xyz
//   poses.bin : 16 float32 row-major T_base_sensor, then K*16 float32
//               row-major T_world_base
// argv: scans.bin poses.bin out.npz mode raycast(0|1) submode width height
//       resolution [postprocess(0|1)] [sensor(lidar|rgbd|constant)]
//       [intensity(0|1)] [color(0|1)]
// where `mode` (argv[4]) selects:
//   kalman|p2  - run the mapping pipeline (submode = local|global)
//   batch      - buildDEM on the first scan
//   npzload    - scans.bin is an .npz path: load via the reference reader,
//                re-save to out.npz
//   pcdload    - scans.bin is a .pcd path: parse via nanoPCL, re-save
//   png        - scans.bin is an .npz path: render `elevation` to out PNG
//                (submode = viridis|jet|grayscale)
// Scan records are xyz (3 floats), +1 with intensity=1, +3 (r g b as
// u8-valued floats) with color=1 — K*N*stride float32 after the header.

// With FASTDEM_BENCH_REPS=<R> in the environment, the integrate loop is
// repeated R times on fresh maps and timed (wall, best rep), printing
// "bench: <ms> ms/scan" — regenerating the reference's performance
// baseline on the local CPU for a measured-same-data comparison
// (BASELINE.md: published numbers must be regenerated locally).

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include <fastdem/fastdem.hpp>
#include <fastdem/bridge/ros/impl.hpp>
#include <nanopcl/bridge/ros/impl.hpp>
#include <fastdem/io/npz.hpp>
#include <fastdem/io/pcd_convert.hpp>
#include <fastdem/io/png.hpp>
#include <fastdem/postprocess/feature_extraction.hpp>
#include <fastdem/postprocess/inpainting.hpp>
#include <fastdem/postprocess/spatial_smoothing.hpp>
#include <fastdem/postprocess/uncertainty_fusion.hpp>
#include <nanopcl/core/point_cloud.hpp>
#include <nanopcl/io/pcd_io.hpp>
#include <nanopcl/filters/downsample.hpp>
#include <nanopcl/geometry/normal_estimation.hpp>
#include <nanopcl/registration/align.hpp>
#include <nanopcl/filters/deskew.hpp>
#include <nanopcl/segmentation/euclidean_cluster.hpp>
#include <nanopcl/segmentation/ground_seg.hpp>
#include <nanopcl/io/trajectory_io.hpp>

namespace {

bool read_all(const std::string& path, std::vector<char>& out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  f.seekg(0, std::ios::end);
  out.resize(static_cast<std::size_t>(f.tellg()));
  f.seekg(0);
  f.read(out.data(), static_cast<std::streamsize>(out.size()));
  return static_cast<bool>(f);
}

Eigen::Isometry3d isometry_from(const float* m) {
  Eigen::Matrix4d T;
  for (int r = 0; r < 4; ++r)
    for (int c = 0; c < 4; ++c) T(r, c) = m[r * 4 + c];
  Eigen::Isometry3d iso = Eigen::Isometry3d::Identity();
  iso.matrix() = T;
  return iso;
}

}  // namespace

namespace pc2mock {

// Minimal stand-ins for sensor_msgs types so the reference's templated
// bridge code instantiates without a ROS installation.
struct Field {
  static constexpr uint8_t INT8 = 1, UINT8 = 2, INT16 = 3, UINT16 = 4,
                           INT32 = 5, UINT32 = 6, FLOAT32 = 7, FLOAT64 = 8;
  std::string name;
  uint32_t offset = 0;
  uint8_t datatype = FLOAT32;
  uint32_t count = 1;
};

struct Msg {
  struct Header {
    uint64_t stamp = 0;
    std::string frame_id;
  } header;
  uint32_t height = 0, width = 0;
  std::vector<Field> fields;
  bool is_bigendian = false;
  uint32_t point_step = 0, row_step = 0;
  std::vector<uint8_t> data;
  bool is_dense = false;
};

// Container format shared with tests/test_reference_goldens.py:
// "PC2G" u32 n_fields {u32 len, name, u32 offset, u32 datatype, u32 count}
// u32 height width point_step row_step, u8 is_bigendian is_dense,
// u64 data_len, data, u32 frame_len, frame_id
inline void dump(const Msg& m, const std::string& path) {
  std::ofstream f(path, std::ios::binary);
  f.write("PC2G", 4);
  auto w32 = [&](uint32_t v) { f.write(reinterpret_cast<char*>(&v), 4); };
  auto w8 = [&](uint8_t v) { f.write(reinterpret_cast<char*>(&v), 1); };
  w32(static_cast<uint32_t>(m.fields.size()));
  for (const auto& fd : m.fields) {
    w32(static_cast<uint32_t>(fd.name.size()));
    f.write(fd.name.data(), static_cast<std::streamsize>(fd.name.size()));
    w32(fd.offset);
    w32(fd.datatype);
    w32(fd.count);
  }
  w32(m.height);
  w32(m.width);
  w32(m.point_step);
  w32(m.row_step);
  w8(m.is_bigendian ? 1 : 0);
  w8(m.is_dense ? 1 : 0);
  uint64_t dl = m.data.size();
  f.write(reinterpret_cast<char*>(&dl), 8);
  f.write(reinterpret_cast<const char*>(m.data.data()),
          static_cast<std::streamsize>(m.data.size()));
  w32(static_cast<uint32_t>(m.header.frame_id.size()));
  f.write(m.header.frame_id.data(),
          static_cast<std::streamsize>(m.header.frame_id.size()));
}

inline bool load(const std::string& path, Msg& m) {
  std::ifstream f(path, std::ios::binary);
  char magic[4];
  f.read(magic, 4);
  if (!f || std::memcmp(magic, "PC2G", 4) != 0) return false;
  auto r32 = [&]() { uint32_t v; f.read(reinterpret_cast<char*>(&v), 4); return v; };
  auto r8 = [&]() { uint8_t v; f.read(reinterpret_cast<char*>(&v), 1); return v; };
  uint32_t nf = r32();
  m.fields.resize(nf);
  for (auto& fd : m.fields) {
    uint32_t len = r32();
    fd.name.resize(len);
    f.read(fd.name.data(), len);
    fd.offset = r32();
    fd.datatype = static_cast<uint8_t>(r32());
    fd.count = r32();
  }
  m.height = r32();
  m.width = r32();
  m.point_step = r32();
  m.row_step = r32();
  m.is_bigendian = r8() != 0;
  m.is_dense = r8() != 0;
  uint64_t dl;
  f.read(reinterpret_cast<char*>(&dl), 8);
  m.data.resize(dl);
  f.read(reinterpret_cast<char*>(m.data.data()),
         static_cast<std::streamsize>(dl));
  uint32_t fl = r32();
  m.header.frame_id.resize(fl);
  f.read(m.header.frame_id.data(), fl);
  return static_cast<bool>(f);
}

}  // namespace pc2mock

int main(int argc, char** argv) {
  if (argc < 10) {
    std::cerr << "usage: golden_gen scans.bin poses.bin out.npz "
                 "kalman|p2 raycast mode width height res [postprocess]\n";
    return 2;
  }
  const std::string scans_path = argv[1];
  const std::string poses_path = argv[2];
  const std::string out_path = argv[3];
  const std::string estimator = argv[4];
  const bool raycast = std::atoi(argv[5]) != 0;
  const std::string mode = argv[6];
  const float width = std::atof(argv[7]);
  const float height = std::atof(argv[8]);
  const float res = std::atof(argv[9]);
  const bool postprocess = argc > 10 && std::atoi(argv[10]) != 0;
  const std::string sensor = argc > 11 ? argv[11] : "lidar";
  const bool with_intensity = argc > 12 && std::atoi(argv[12]) != 0;
  const bool with_color = argc > 13 && std::atoi(argv[13]) != 0;
  const int stride = 3 + (with_intensity ? 1 : 0) + (with_color ? 3 : 0);

  std::vector<char> scans_raw, poses_raw;
  if (!read_all(scans_path, scans_raw) || !read_all(poses_path, poses_raw)) {
    std::cerr << "cannot read inputs\n";
    return 2;
  }
  std::int32_t K, N;
  std::memcpy(&K, scans_raw.data(), 4);
  std::memcpy(&N, scans_raw.data() + 4, 4);
  const float* xyz = reinterpret_cast<const float*>(scans_raw.data() + 8);
  const float* tbs = reinterpret_cast<const float*>(poses_raw.data());
  const float* twb = tbs + 16;

  if (estimator == "png") {
    // PNG render interop: load an npz, render `elevation` with the
    // reference's colormap/normalization (src/io_png.cpp:117-181), and
    // write the PNG for pixel-level comparison with io/png.py. mode
    // selects the colormap (viridis|jet|grayscale).
    fastdem::ElevationMap map;
    if (!fastdem::io::loadNpz(scans_path, map)) {
      std::cerr << "loadNpz failed\n";
      return 5;
    }
    fastdem::io::PngExportConfig pcfg;
    if (mode == "jet")
      pcfg.colormap = fastdem::io::PngExportConfig::Colormap::JET;
    if (mode == "grayscale")
      pcfg.colormap = fastdem::io::PngExportConfig::Colormap::GRAYSCALE;
    if (!fastdem::io::savePng(out_path, map, "elevation", pcfg)) {
      std::cerr << "savePng failed\n";
      return 6;
    }
    std::printf("golden(png): %s\n", out_path.c_str());
    return 0;
  }

  if (estimator == "voxel") {
    // voxelGrid golden: downsample the first scan at `res` with CENTROID
    // and ANY modes; write both results as binary PCDs (out_path gets
    // ".centroid.pcd"/".any.pcd" suffixes).
    nanopcl::PointCloud cloud;
    cloud.reserve(N);
    for (std::int32_t i = 0; i < N; ++i) {
      cloud.add(xyz[i * 3], xyz[i * 3 + 1], xyz[i * 3 + 2]);
    }
    auto cen = nanopcl::filters::voxelGrid(cloud, res,
                                           nanopcl::filters::VoxelMode::CENTROID);
    auto any = nanopcl::filters::voxelGrid(cloud, res,
                                           nanopcl::filters::VoxelMode::ANY);
    nanopcl::io::savePCD(out_path + ".centroid.pcd", cen,
                         nanopcl::io::PCDFormat::BINARY);
    nanopcl::io::savePCD(out_path + ".any.pcd", any,
                         nanopcl::io::PCDFormat::BINARY);
    std::printf("golden(voxel): %zu -> %zu (centroid), %zu (any)\n",
                cloud.size(), cen.size(), any.size());
    return 0;
  }

  if (estimator == "icp") {
    // Registration golden: scans.bin holds K=2 clouds (source, target);
    // run nanoPCL ICP and GICP and print the recovered 4x4 transforms
    // (row-major) + fitness for comparison with cloud/registration.py.
    nanopcl::PointCloud src, tgt;
    src.reserve(N);
    tgt.reserve(N);
    for (std::int32_t i = 0; i < N; ++i) {
      src.add(xyz[i * 3], xyz[i * 3 + 1], xyz[i * 3 + 2]);
      const float* q = xyz + (static_cast<std::size_t>(N) + i) * 3;
      tgt.add(q[0], q[1], q[2]);
    }
    nanopcl::geometry::estimateCovariances(src, 10);
    nanopcl::geometry::estimateCovariances(tgt, 10);
    for (const char* m : {"icp", "gicp", "vgicp"}) {
      nanopcl::registration::AlignSettings st;
      st.max_iterations = 50;
      st.max_correspondence_dist = 1.0;
      const Eigen::Isometry3d init = Eigen::Isometry3d::Identity();
      // `res` as the VGICP voxel resolution (argv[9], meters).
      auto run = [&]() {
        if (std::string(m) == "icp")
          return nanopcl::registration::alignICP(src, tgt, init, st);
        if (std::string(m) == "gicp")
          return nanopcl::registration::alignGICP(src, tgt, init, st);
        return nanopcl::registration::alignVGICP(src, tgt, res, init, st);
      };
      auto res2 = run();
      auto& res = res2;
      const Eigen::Matrix4d T = res.transform.matrix();
      std::printf("%s converged=%d fitness=%.4f T=", m, (int)res.converged,
                  res.fitness);
      for (int r = 0; r < 4; ++r)
        for (int c = 0; c < 4; ++c) std::printf("%.8f ", T(r, c));
      std::printf("\n");
    }
    return 0;
  }

  if (estimator == "traj") {
    // Trajectory IO golden: scans.bin is a TUM (mode=tum) or KITTI
    // (mode=kitti) trajectory text file WRITTEN BY fastdem_tpu; load it
    // with nanoPCL's reader, re-save with its writer to out_path, and
    // print the pose count + first/last translations for sanity.
    nanopcl::io::Trajectory traj =
        (mode == "tum") ? nanopcl::io::loadTrajectoryTUM(scans_path)
                        : nanopcl::io::loadTrajectoryKITTI(scans_path);
    if (mode == "tum") {
      nanopcl::io::saveTrajectoryTUM(out_path, traj);
    } else {
      nanopcl::io::saveTrajectoryKITTI(out_path, traj);
    }
    const auto& first = *traj.begin();
    std::printf("golden(traj): %zu poses t0=%f p0=%f %f %f\n", traj.size(),
                first.timestamp, first.pose.translation().x(),
                first.pose.translation().y(), first.pose.translation().z());
    return 0;
  }

  if (estimator == "deskew") {
    // Deskew golden: scans.bin holds ONE cloud with intensity=1 whose
    // 4th float is the per-point TIME channel; poses.bin's T_bs slot is
    // unused and the two T_wb entries are (T_start, T_end). Runs
    // nanopcl::filters::deskew (filters/deskew.hpp:97) and dumps the
    // corrected xyz for comparison with cloud/filters.deskew.
    nanopcl::PointCloud cloud;
    cloud.reserve(N);
    cloud.useTime();
    for (std::int32_t i = 0; i < N; ++i) {
      const float* p = xyz + static_cast<std::size_t>(i) * stride;
      // add() pushes a default time slot (pushDefaultChannelValues);
      // overwrite it with the record's 4th float.
      cloud.add(p[0], p[1], p[2]);
      cloud.time(static_cast<std::size_t>(i)) = p[3];
    }
    const Eigen::Isometry3d T_start = isometry_from(twb);
    const Eigen::Isometry3d T_end = isometry_from(twb + 16);
    auto out = nanopcl::filters::deskew(cloud, T_start, T_end);
    std::ofstream f(out_path, std::ios::binary);
    std::int32_t n_out = static_cast<std::int32_t>(out.size());
    f.write(reinterpret_cast<char*>(&n_out), 4);
    for (std::size_t i = 0; i < out.size(); ++i) {
      float v[3] = {out[i].x(), out[i].y(), out[i].z()};
      f.write(reinterpret_cast<char*>(v), 12);
    }
    std::printf("golden(deskew): %d pts\n", n_out);
    return 0;
  }

  if (estimator == "seg") {
    // Segmentation golden: euclidean clustering (tolerance = res) and
    // ground segmentation with default config on the first scan; dumps
    // per-point cluster labels (-1 noise) and the ground mask.
    nanopcl::PointCloud cloud;
    cloud.reserve(N);
    for (std::int32_t i = 0; i < N; ++i) {
      const float* p = xyz + static_cast<std::size_t>(i) * stride;
      cloud.add(p[0], p[1], p[2]);
    }
    nanopcl::segmentation::ClusterConfig cc;
    cc.tolerance = res;
    cc.min_size = 5;
    auto clusters = nanopcl::segmentation::euclideanCluster(cloud, cc);
    std::vector<std::int32_t> label(N, -1);
    for (std::size_t c = 0; c < clusters.numClusters(); ++c) {
      for (std::uint32_t idx : clusters.clusterIndices(c)) {
        label[idx] = static_cast<std::int32_t>(c);
      }
    }
    auto ground = nanopcl::segmentation::segmentGround(cloud);
    std::vector<std::uint8_t> gmask(N, 0);
    for (std::uint32_t idx : ground.ground) gmask[idx] = 1;
    std::ofstream f(out_path, std::ios::binary);
    std::int32_t n_out = N;
    f.write(reinterpret_cast<char*>(&n_out), 4);
    f.write(reinterpret_cast<char*>(label.data()), 4 * N);
    f.write(reinterpret_cast<char*>(gmask.data()), N);
    std::printf("golden(seg): %zu clusters, %zu ground pts\n",
                clusters.numClusters(), ground.ground.size());
    return 0;
  }

  if (estimator == "pc2") {
    // PointCloud2 byte golden: load an npz (written by fastdem_tpu), run
    // the reference's map->PointCloud2 conversion
    // (include/fastdem/bridge/ros/impl.hpp:28-174) with mock msg types,
    // dump field table + data bytes for byte-level comparison with
    // runtime/wire.map_to_pointcloud2.
    fastdem::ElevationMap map;
    if (!fastdem::io::loadNpz(scans_path, map)) {
      std::cerr << "loadNpz failed\n";
      return 5;
    }
    auto msg = fastdem::detail::toPointCloud2Impl<pc2mock::Msg,
                                                  pc2mock::Field>(
        map, static_cast<uint64_t>(0), "elevation");
    pc2mock::dump(msg, out_path);
    std::printf("golden(pc2): %u pts, %u fields, step %u\n", msg.width,
                static_cast<uint32_t>(msg.fields.size()), msg.point_step);
    return 0;
  }

  if (estimator == "pc2cloud") {
    // Cloud codec golden: read a PointCloud2 dump produced by
    // runtime/wire.cloud_to_pointcloud2, parse it with nanoPCL's reader
    // (lib/nanoPCL/include/nanopcl/bridge/ros/impl.hpp from_impl), then
    // re-emit with nanoPCL's writer (to_impl) — the Python side decodes
    // the result and compares with the original cloud, validating both
    // codec directions against the reference conventions.
    pc2mock::Msg in;
    if (!pc2mock::load(scans_path, in)) {
      std::cerr << "pc2 container load failed\n";
      return 5;
    }
    auto cloud =
        nanopcl::detail::from_impl<pc2mock::Msg, pc2mock::Field>(in);
    auto out = nanopcl::detail::to_impl<pc2mock::Msg, pc2mock::Field, uint64_t>(
        cloud, in.header.frame_id, 0);
    pc2mock::dump(out, out_path);
    std::printf("golden(pc2cloud): %zu pts round-tripped\n", cloud.size());
    return 0;
  }

  if (estimator == "pcdload") {
    // PCD interop: parse a .pcd WRITTEN BY fastdem_tpu with nanoPCL's
    // reader (io/pcd_io.hpp) and write it back with nanoPCL's writer —
    // the Python side compares both against the original arrays.
    nanopcl::io::PCDMetadata meta;
    auto cloud = nanopcl::io::loadPCD(scans_path, meta);
    if (cloud.empty()) {
      std::cerr << "loadPCD returned empty\n";
      return 5;
    }
    // Preserve the parsed VIEWPOINT through the re-save (PCDSaveOptions,
    // io/pcd_io.hpp:60-64) so the Python side can verify metadata parity.
    nanopcl::io::PCDSaveOptions opts;
    opts.format = nanopcl::io::PCDFormat::BINARY;
    opts.viewpoint = meta.viewpoint;
    nanopcl::io::savePCD(out_path, cloud, opts);
    const auto t = meta.viewpoint.translation();
    const Eigen::Quaterniond q(meta.viewpoint.rotation());
    std::printf("golden(pcdload): %zu pts viewpoint %g %g %g %g %g %g %g\n",
                cloud.size(), t.x(), t.y(), t.z(), q.w(), q.x(), q.y(),
                q.z());
    return 0;
  }

  if (estimator == "npzload") {
    // npz interop: load a map WRITTEN BY fastdem_tpu through the
    // reference reader (src/io_npz.cpp:440-614) and re-save it — the
    // Python side compares the round trip (schema + geometry + layers).
    fastdem::ElevationMap map;
    if (!fastdem::io::loadNpz(scans_path, map)) {
      std::cerr << "loadNpz failed\n";
      return 5;
    }
    if (!fastdem::io::saveNpz(out_path, map)) {
      std::cerr << "saveNpz failed\n";
      return 4;
    }
    std::printf("golden(npzload): %s -> %s (%d x %d @ %.3f, %zu layers)\n",
                scans_path.c_str(), out_path.c_str(), map.getSize()(0),
                map.getSize()(1), map.getResolution(),
                map.getLayers().size());
    return 0;
  }

  if (estimator == "batch") {
    // Offline buildDEM path (src/pcd_convert.cpp:275-323): first scan only,
    // default DEMConfig at the given resolution.
    nanopcl::PointCloud cloud;
    cloud.reserve(N);
    for (std::int32_t i = 0; i < N; ++i) {
      cloud.add(xyz[i * stride], xyz[i * stride + 1], xyz[i * stride + 2]);
    }
    fastdem::DEMConfig dcfg;
    dcfg.resolution = res;
    auto dem = fastdem::buildDEM(cloud, dcfg);
    if (!fastdem::io::saveNpz(out_path, dem)) {
      std::cerr << "saveNpz failed\n";
      return 4;
    }
    std::printf("golden(batch): %d pts -> %s\n", N, out_path.c_str());
    return 0;
  }

  fastdem::Config cfg;
  cfg.mapping.estimation_type = (estimator == "p2")
                                    ? fastdem::EstimationType::P2Quantile
                                    : fastdem::EstimationType::Kalman;
  cfg.mapping.mode = (mode == "global") ? fastdem::MappingMode::GLOBAL
                                        : fastdem::MappingMode::LOCAL;
  cfg.raycasting.enabled = raycast;
  if (sensor == "rgbd") {
    cfg.sensor_model.type = fastdem::SensorType::RGBD;
  } else if (sensor == "constant") {
    cfg.sensor_model.type = fastdem::SensorType::Constant;
  }

  // Pre-build the per-scan clouds once (IO/alloc excluded from timing).
  const Eigen::Isometry3d T_bs = isometry_from(tbs);
  std::vector<nanopcl::PointCloud> clouds(K);
  std::vector<Eigen::Isometry3d> T_wbs(K, Eigen::Isometry3d::Identity());
  for (std::int32_t k = 0; k < K; ++k) {
    clouds[k].reserve(N);
    const float* p = xyz + static_cast<std::size_t>(k) * N * stride;
    for (std::int32_t i = 0; i < N; ++i) {
      const float* q = p + i * stride;
      const int coff = with_intensity ? 4 : 3;
      if (with_intensity && with_color) {
        clouds[k].add(q[0], q[1], q[2], nanopcl::Intensity(q[3]),
                      nanopcl::Color(static_cast<uint8_t>(q[coff]),
                                     static_cast<uint8_t>(q[coff + 1]),
                                     static_cast<uint8_t>(q[coff + 2])));
      } else if (with_color) {
        clouds[k].add(q[0], q[1], q[2],
                      nanopcl::Color(static_cast<uint8_t>(q[coff]),
                                     static_cast<uint8_t>(q[coff + 1]),
                                     static_cast<uint8_t>(q[coff + 2])));
      } else if (with_intensity) {
        clouds[k].add(q[0], q[1], q[2], nanopcl::Intensity(q[3]));
      } else {
        clouds[k].add(q[0], q[1], q[2]);
      }
    }
    T_wbs[k] = isometry_from(twb + k * 16);
  }

  fastdem::ElevationMap map(width, height, res, "map");
  {
    fastdem::FastDEM mapper(map, cfg);
    for (std::int32_t k = 0; k < K; ++k) {
      if (!mapper.integrate(clouds[k], T_bs, T_wbs[k])) {
        std::cerr << "integrate failed at scan " << k << "\n";
        return 3;
      }
    }
  }

  if (const char* reps_env = std::getenv("FASTDEM_BENCH_REPS")) {
    const int reps = std::atoi(reps_env);
    double best_ms = 1e18;
    for (int rep = 0; rep < reps; ++rep) {
      fastdem::ElevationMap bmap(width, height, res, "map");
      fastdem::FastDEM bmapper(bmap, cfg);
      const auto t0 = std::chrono::steady_clock::now();
      for (std::int32_t k = 0; k < K; ++k) {
        bmapper.integrate(clouds[k], T_bs, T_wbs[k]);
      }
      const auto t1 = std::chrono::steady_clock::now();
      const double ms =
          std::chrono::duration<double, std::milli>(t1 - t0).count() / K;
      if (ms < best_ms) best_ms = ms;
    }
    std::printf("bench: %.3f ms/scan (best of %d reps, %d scans x %d pts)\n",
                best_ms, reps, K, N);
  }

  if (postprocess) {
    fastdem::config::UncertaintyFusion uf;
    uf.enabled = true;
    fastdem::applyUncertaintyFusion(map, uf);
    fastdem::applyInpainting(map, /*max_iterations=*/3,
                             /*min_valid_neighbors=*/3, /*inplace=*/true);
    fastdem::applyFeatureExtraction(map, /*analysis_radius=*/0.3f,
                                    /*min_valid_neighbors=*/4,
                                    /*step_lower_percentile=*/0.05f,
                                    /*step_upper_percentile=*/0.95f);
    // Median smoothing on a copy layer so the upstream comparisons stay
    // untouched (spatial_smoothing.hpp:38-67).
    map.add("elevation_smoothed", map.get("elevation"));
    fastdem::applySpatialSmoothing(map, "elevation_smoothed",
                                   /*kernel_size=*/3,
                                   /*min_valid_neighbors=*/5);
  }

  if (!fastdem::io::saveNpz(out_path, map)) {
    std::cerr << "saveNpz failed\n";
    return 4;
  }
  std::printf("golden: %d scans -> %s\n", K, out_path.c_str());
  return 0;
}
