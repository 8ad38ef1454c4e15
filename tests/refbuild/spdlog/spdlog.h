// Minimal spdlog shim for the golden generator: the compiled reference
// sources use only spdlog::warn / spdlog::error with fmt-style messages;
// messages go to stderr with "{}" placeholders naively substituted.
#ifndef SPDLOG_COMPAT_H
#define SPDLOG_COMPAT_H
#include <iostream>
#include <sstream>
#include <string>

namespace spdlog {
namespace detail {
inline void format_rec(std::ostream& os, const std::string& fmt) { os << fmt; }
template <typename A, typename... Rest>
void format_rec(std::ostream& os, const std::string& fmt, const A& a,
                Rest&&... rest) {
  auto pos = fmt.find("{}");
  if (pos == std::string::npos) {
    os << fmt;
    return;
  }
  os << fmt.substr(0, pos) << a;
  format_rec(os, fmt.substr(pos + 2), std::forward<Rest>(rest)...);
}
template <typename... A>
void log(const char* lvl, const std::string& fmt, A&&... args) {
  std::ostringstream os;
  format_rec(os, fmt, std::forward<A>(args)...);
  std::cerr << "[" << lvl << "] " << os.str() << "\n";
}
}  // namespace detail

template <typename... A>
void warn(const std::string& fmt, A&&... args) {
  detail::log("warn", fmt, std::forward<A>(args)...);
}
template <typename... A>
void error(const std::string& fmt, A&&... args) {
  detail::log("error", fmt, std::forward<A>(args)...);
}
template <typename... A>
void info(const std::string& fmt, A&&... args) {
  detail::log("info", fmt, std::forward<A>(args)...);
}
template <typename... A>
void debug(const std::string&, A&&...) {}
}  // namespace spdlog
#endif
