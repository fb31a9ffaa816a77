// Open-loop HTTP load generator for the native serving frontend.
//
// Why in-tree and native: the serving closed-loop target is >=20k req/s on
// a single host core shared with the server — a Python client would be the
// bottleneck, not the system under test. One epoll thread, N keep-alive
// connections, requests paced at a fixed offered rate (open loop: send
// times are scheduled on a fixed grid; if the system falls behind, the
// backlog bursts rather than silently lowering the offered rate). Latency
// is measured from the SCHEDULED send time to response completion, so
// client-side queueing counts against the system.
//
// Usage: ldloadgen <port> <rate_per_s> <duration_s> <n_conns> <top> [path]
// Output: one JSON line with offered/achieved rates and latency quantiles.

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#include <algorithm>
#include <deque>
#include <string>
#include <vector>

namespace {

int64_t now_us() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return int64_t(ts.tv_sec) * 1000000 + ts.tv_nsec / 1000;
}

struct Conn {
  int fd = -1;
  std::string in;
  std::string out;          // unsent request bytes
  std::deque<int64_t> sched;  // scheduled send time per in-flight request
  size_t skip = 0;          // body bytes still to consume
  bool cur_ok = true;       // current response was a 200
};

bool conn_connect(Conn& c, int port) {
  c.fd = socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (connect(c.fd, reinterpret_cast<sockaddr*>(&addr), sizeof addr)) {
    return false;
  }
  int one = 1;
  setsockopt(c.fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
  // nonblocking after connect
  fcntl(c.fd, F_SETFL, fcntl(c.fd, F_GETFL) | O_NONBLOCK);
  return true;
}

void finish_response(Conn& c, int64_t t_recv, std::vector<int32_t>& lat_us,
                     int64_t& done, int64_t& errors) {
  if (c.sched.empty()) return;  // unsolicited bytes; ignore
  if (c.cur_ok) {
    lat_us.push_back(static_cast<int32_t>(
        std::min<int64_t>(t_recv - c.sched.front(), INT32_MAX)));
    ++done;
  } else {
    ++errors;
  }
  c.sched.pop_front();
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 6) {
    fprintf(stderr,
            "usage: ldloadgen <port> <rate> <duration_s> <conns> <top> "
            "[path_prefix]\n");
    return 2;
  }
  int port = atoi(argv[1]);
  double rate = atof(argv[2]);
  double duration = atof(argv[3]);
  int n_conns = atoi(argv[4]);
  int top = atoi(argv[5]);
  std::string prefix = argc > 6 ? argv[6] : "/search?q=";

  // request pool: distinct caption-ish queries (percent-encoded spaces)
  std::vector<std::string> reqs;
  for (int i = 0; i < 64; ++i) {
    char buf[256];
    snprintf(buf, sizeof buf,
             "GET %sa%%20photo%%20of%%20a%%20dog%%20near%%20the%%20"
             "fountain%%20%d&top=%d HTTP/1.1\r\nHost: l\r\n\r\n",
             prefix.c_str(), i, top);
    reqs.emplace_back(buf);
  }

  std::vector<Conn> conns(static_cast<size_t>(n_conns));
  int ep = epoll_create1(0);
  for (int i = 0; i < n_conns; ++i) {
    if (!conn_connect(conns[i], port)) {
      fprintf(stderr, "connect failed: %s\n", strerror(errno));
      return 1;
    }
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.u32 = static_cast<uint32_t>(i);
    epoll_ctl(ep, EPOLL_CTL_ADD, conns[i].fd, &ev);
  }

  const int64_t t0 = now_us();
  const int64_t t_stop = t0 + int64_t(duration * 1e6);
  const double step_us = 1e6 / rate;
  int64_t scheduled = 0;       // requests whose send time has arrived
  int64_t sent = 0, done = 0, errors = 0;
  std::vector<int32_t> lat_us;
  lat_us.reserve(size_t(rate * duration) + 1024);
  int rr = 0;
  char buf[65536];
  epoll_event evs[64];

  auto pump_writes = [&](Conn& c) {
    while (!c.out.empty()) {
      ssize_t w = send(c.fd, c.out.data(), c.out.size(), MSG_NOSIGNAL);
      if (w > 0) {
        c.out.erase(0, static_cast<size_t>(w));
      } else {
        break;  // EAGAIN: retry next loop iteration
      }
    }
  };

  for (;;) {
    int64_t now = now_us();
    if (now >= t_stop && done + errors >= sent) break;
    if (now >= t_stop + int64_t(10e6)) break;  // 10 s drain cap

    // schedule + send every request whose grid time has passed
    if (now < t_stop) {
      int64_t due = int64_t((now - t0) / step_us) + 1;
      while (scheduled < due) {
        Conn& c = conns[static_cast<size_t>(rr++ % n_conns)];
        c.out += reqs[static_cast<size_t>(scheduled % reqs.size())];
        c.sched.push_back(t0 + int64_t(scheduled * step_us));
        ++scheduled;
        ++sent;
        pump_writes(c);
      }
    }

    int n = epoll_wait(ep, evs, 64, 1);
    int64_t t_recv = now_us();
    for (int i = 0; i < n; ++i) {
      Conn& c = conns[evs[i].data.u32];
      for (;;) {
        ssize_t r = recv(c.fd, buf, sizeof buf, 0);
        if (r <= 0) break;
        c.in.append(buf, static_cast<size_t>(r));
        if (r < static_cast<ssize_t>(sizeof buf)) break;
      }
      // parse complete responses (cursor + one erase per drain: per-
      // response erase is quadratic when a read delivers many pipelined
      // responses)
      size_t pos = 0;
      for (;;) {
        if (c.skip) {
          size_t take = std::min(c.skip, c.in.size() - pos);
          pos += take;
          c.skip -= take;
          if (c.skip) break;
          finish_response(c, t_recv, lat_us, done, errors);
          continue;
        }
        size_t he = c.in.find("\r\n\r\n", pos);
        if (he == std::string::npos) break;
        // status + content-length
        c.cur_ok = c.in.compare(pos, 12, "HTTP/1.1 200") == 0;
        size_t clpos = c.in.find("Content-Length:", pos);
        size_t cl = 0;
        if (clpos != std::string::npos && clpos < he) {
          cl = strtoul(c.in.c_str() + clpos + 15, nullptr, 10);
        }
        pos = he + 4;
        c.skip = cl;
        if (!c.skip) finish_response(c, t_recv, lat_us, done, errors);
      }
      if (pos) c.in.erase(0, pos);
      pump_writes(c);
    }
    // keep flushing partially-written requests even with no events
    if (n == 0) {
      for (auto& c : conns) pump_writes(c);
    }
  }

  double wall_s = (now_us() - t0) / 1e6;
  std::sort(lat_us.begin(), lat_us.end());
  auto q = [&](double p) {
    if (lat_us.empty()) return 0.0;
    size_t i = std::min(lat_us.size() - 1,
                        static_cast<size_t>(p * lat_us.size()));
    return lat_us[i] / 1000.0;
  };
  printf(
      "{\"offered_per_s\": %.0f, \"sent\": %lld, \"completed\": %lld, "
      "\"errors\": %lld, \"wall_s\": %.3f, \"achieved_per_s\": %.0f, "
      "\"p50_ms\": %.3f, \"p90_ms\": %.3f, \"p99_ms\": %.3f, "
      "\"max_ms\": %.3f}\n",
      rate, static_cast<long long>(sent), static_cast<long long>(done),
      static_cast<long long>(errors), wall_s,
      done / std::max(wall_s, 1e-9), q(0.5), q(0.9), q(0.99),
      lat_us.empty() ? 0.0 : lat_us.back() / 1000.0);
  return done > 0 ? 0 : 1;
}
