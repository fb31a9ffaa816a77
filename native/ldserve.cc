// Native HTTP serving frontend for the real-time retriever.
//
// Why native: serving is the paper's whole point (reference
// dvl/utils.py:204-211 serves queries from a notebook; our production path
// must saturate the chip). The TPU sustains ~20.7k queries/s on the
// quantized pipeline (PERF.md), but a Python HTTP layer costs ~50+ us of
// GIL time per request — a single host core caps out near 12k req/s before
// the chip does. This server keeps the per-REQUEST work (socket IO, HTTP
// parsing, micro-batch assembly, JSON response formatting) in C++ and
// crosses into Python only once per BATCH (a ctypes callback that runs the
// fused JAX query program), so the host cost per request is a few
// microseconds and the chip becomes the bottleneck.
//
// Equivalent Python surface: lightningdot_tpu/serving_http.py (kept as the
// zero-dependency fallback). Endpoints and JSON schema are identical:
//   GET /search?q=<text>&top=<k> -> {"query":..., "results":[[id,score]..]}
//   GET /healthz                 -> {"ok":true,"corpus":N}
//
// Threading model (mirrors serving_frontend.BatchingFrontend):
//   * one IO thread: epoll accept/read/write; parses requests and enqueues
//     them; flushes response buffers.
//   * one dispatcher thread: drains up to max_batch requests (waiting at
//     most max_wait_ms after the first), invokes the batch callback once,
//     formats all responses, hands the bytes back to the IO thread.
//   Device calls stay serialized by construction (single dispatcher).
//
// C ABI only (loaded via ctypes; pybind11 is not available in this image).

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdio>
#include <string_view>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

typedef int (*ld_batch_cb)(void* user, const char* q_blob,
                           const int32_t* q_off, int32_t n, int32_t k,
                           int32_t* out_idx, float* out_scores);

struct Conn {
  int fd = -1;
  std::string in;            // unread request bytes (IO thread only)
  std::string out;           // pending response bytes (guarded by m)
  std::mutex m;
  std::atomic<bool> closed{false};
  std::atomic<int> inflight{0};  // batched requests not yet answered
  bool want_write = false;       // EPOLLOUT armed (IO thread only)
};

struct Request {
  std::shared_ptr<Conn> conn;
  std::string query;         // percent-decoded
  int top = 100;             // >0: live /search; <=0: pre-formed -code
};

std::string json_escape(const std::string& s) {
  std::string o;
  o.reserve(s.size() + 8);
  for (unsigned char c : s) {
    switch (c) {
      case '"': o += "\\\""; break;
      case '\\': o += "\\\\"; break;
      case '\n': o += "\\n"; break;
      case '\r': o += "\\r"; break;
      case '\t': o += "\\t"; break;
      default:
        if (c < 0x20) {
          char buf[8];
          snprintf(buf, sizeof buf, "\\u%04x", c);
          o += buf;
        } else {
          o += static_cast<char>(c);
        }
    }
  }
  return o;
}

int hexval(char c) {
  if (c >= '0' && c <= '9') return c - '0';
  if (c >= 'a' && c <= 'f') return c - 'a' + 10;
  if (c >= 'A' && c <= 'F') return c - 'A' + 10;
  return -1;
}

std::string pct_decode(const char* s, size_t n) {
  std::string o;
  o.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    if (s[i] == '+') {
      o += ' ';
    } else if (s[i] == '%' && i + 2 < n) {
      int h = hexval(s[i + 1]), l = hexval(s[i + 2]);
      if (h >= 0 && l >= 0) {
        o += static_cast<char>((h << 4) | l);
        i += 2;
      } else {
        o += s[i];
      }
    } else {
      o += s[i];
    }
  }
  return o;
}

class Server {
 public:
  Server(int port, int max_batch, double max_wait_ms, int max_top,
         std::vector<std::string> ids, ld_batch_cb cb, void* user)
      : max_batch_(max_batch), max_wait_us_(int64_t(max_wait_ms * 1000)),
        max_top_(max_top), default_top_(std::min(100, max_top)), cb_(cb),
        user_(user) {
    // install ids BEFORE the threads start: ids_json_ is read lock-free by
    // the dispatcher, so it must be immutable once requests can flow
    ids_json_.reserve(ids.size());
    for (auto& s : ids) ids_json_.push_back("\"" + json_escape(s) + "\"");
    corpus_n_ = ids.size();
    listen_fd_ = socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK, 0);
    int one = 1;
    setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr), sizeof addr) ||
        listen(listen_fd_, 1024)) {
      err_ = errno;
      close(listen_fd_);
      listen_fd_ = -1;
      return;
    }
    socklen_t alen = sizeof addr;
    getsockname(listen_fd_, reinterpret_cast<sockaddr*>(&addr), &alen);
    port_ = ntohs(addr.sin_port);
    ep_ = epoll_create1(0);
    wake_fd_ = eventfd(0, EFD_NONBLOCK);
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = listen_fd_;
    epoll_ctl(ep_, EPOLL_CTL_ADD, listen_fd_, &ev);
    ev.data.fd = wake_fd_;
    epoll_ctl(ep_, EPOLL_CTL_ADD, wake_fd_, &ev);
    io_ = std::thread([this] { io_loop(); });
    disp_ = std::thread([this] { dispatch_loop(); });
  }

  ~Server() { stop(); }

  void stop() {
    bool was = stopping_.exchange(true);
    if (was) return;
    {
      std::lock_guard<std::mutex> g(qm_);
      qcv_.notify_all();
    }
    wake();
    if (disp_.joinable()) disp_.join();
    if (io_.joinable()) io_.join();
    if (listen_fd_ >= 0) close(listen_fd_);
    if (ep_ >= 0) close(ep_);
    if (wake_fd_ >= 0) close(wake_fd_);
  }

  int port() const { return port_; }
  int error() const { return err_; }
  void stats(uint64_t* out) const {
    out[0] = n_requests_.load();
    out[1] = n_batches_.load();
    out[2] = n_batched_reqs_.load();
    out[3] = n_errors_.load();
  }

 private:
  void wake() {
    uint64_t one = 1;
    ssize_t r = write(wake_fd_, &one, sizeof one);
    (void)r;
  }

  // ---- IO thread -----------------------------------------------------------
  void io_loop() {
    epoll_event evs[256];
    while (!stopping_.load()) {
      int n = epoll_wait(ep_, evs, 256, 50);
      for (int i = 0; i < n; ++i) {
        int fd = evs[i].data.fd;
        if (fd == listen_fd_) {
          accept_all();
        } else if (fd == wake_fd_) {
          uint64_t junk;
          while (read(wake_fd_, &junk, sizeof junk) > 0) {
          }
          flush_all();
        } else {
          auto it = conns_.find(fd);
          if (it == conns_.end()) continue;
          if (evs[i].events & (EPOLLHUP | EPOLLERR)) {
            drop(it->second);
            continue;
          }
          if (evs[i].events & EPOLLIN) handle_read(it->second);
          if (evs[i].events & EPOLLOUT) flush(it->second);
        }
      }
    }
    for (auto& kv : conns_) {
      kv.second->closed.store(true);
      close(kv.second->fd);
    }
    conns_.clear();
  }

  void accept_all() {
    for (;;) {
      int fd = accept4(listen_fd_, nullptr, nullptr, SOCK_NONBLOCK);
      if (fd < 0) break;
      int one = 1;
      setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
      auto c = std::make_shared<Conn>();
      c->fd = fd;
      conns_[fd] = c;
      epoll_event ev{};
      ev.events = EPOLLIN;
      ev.data.fd = fd;
      epoll_ctl(ep_, EPOLL_CTL_ADD, fd, &ev);
    }
  }

  void drop(const std::shared_ptr<Conn>& c) {
    c->closed.store(true);
    epoll_ctl(ep_, EPOLL_CTL_DEL, c->fd, nullptr);
    close(c->fd);
    conns_.erase(c->fd);
  }

  void handle_read(const std::shared_ptr<Conn>& c) {
    char buf[16384];
    for (;;) {
      ssize_t r = recv(c->fd, buf, sizeof buf, 0);
      if (r > 0) {
        c->in.append(buf, static_cast<size_t>(r));
        if (r < static_cast<ssize_t>(sizeof buf)) break;
      } else if (r == 0) {
        drop(c);
        return;
      } else {
        if (errno == EAGAIN || errno == EWOULDBLOCK) break;
        drop(c);
        return;
      }
    }
    // parse every complete pipelined request in the buffer
    size_t start = 0;
    for (;;) {
      size_t hdr_end = c->in.find("\r\n\r\n", start);
      if (hdr_end == std::string::npos) break;
      parse_request(c, c->in.data() + start, hdr_end - start);
      start = hdr_end + 4;
    }
    if (start) c->in.erase(0, start);
    if (c->in.size() > (1u << 20)) drop(c);  // oversized header flood
  }

  void parse_request(const std::shared_ptr<Conn>& c, const char* h,
                     size_t n) {
    n_requests_.fetch_add(1);
    // request line: METHOD SP PATH SP VERSION
    const char* sp1 = static_cast<const char*>(memchr(h, ' ', n));
    if (!sp1 || std::string_view(h, sp1 - h) != "GET") {
      respond_now(c, 405, "{\"error\":\"GET only\"}");
      return;
    }
    const char* path = sp1 + 1;
    const char* sp2 = static_cast<const char*>(
        memchr(path, ' ', n - (path - h)));
    if (!sp2) {
      respond_now(c, 400, "{\"error\":\"bad request line\"}");
      return;
    }
    std::string_view target(path, sp2 - path);
    if (target == "/healthz") {
      char body[64];
      int m = snprintf(body, sizeof body, "{\"ok\":true,\"corpus\":%zu}",
                       corpus_n_);
      respond_now(c, 200, std::string(body, m));
      return;
    }
    size_t qpos = target.find('?');
    std::string_view route = target.substr(0, qpos);
    if (route != "/search") {
      respond_now(c, 404, "{\"error\":\"unknown path\"}");
      return;
    }
    std::string query;
    long top = default_top_;
    bool bad_top = false;
    if (qpos != std::string_view::npos) {
      std::string_view qs = target.substr(qpos + 1);
      size_t p = 0;
      while (p < qs.size()) {
        size_t amp = qs.find('&', p);
        if (amp == std::string_view::npos) amp = qs.size();
        std::string_view kv = qs.substr(p, amp - p);
        size_t eq = kv.find('=');
        if (eq != std::string_view::npos) {
          std::string_view key = kv.substr(0, eq);
          std::string_view val = kv.substr(eq + 1);
          if (key == "q") {
            query = pct_decode(val.data(), val.size());
          } else if (key == "top") {
            char* end = nullptr;
            std::string vs(val);
            top = strtol(vs.c_str(), &end, 10);
            if (end == vs.c_str() || *end) bad_top = true;
          }
        }
        p = amp + 1;
      }
    }
    if (query.empty()) {
      respond_now(c, 400, "{\"error\":\"missing q parameter\"}");
      return;
    }
    if (bad_top) {
      respond_now(c, 400, "{\"error\":\"top must be an integer\"}");
      return;
    }
    if (top < 1 || top > max_top_) {
      char body[96];
      int m = snprintf(body, sizeof body,
                       "{\"error\":\"top must be in [1, %d]\"}", max_top_);
      respond_now(c, 400, std::string(body, m));
      return;
    }
    Request req;
    req.conn = c;
    req.query = std::move(query);
    req.top = static_cast<int>(top);
    c->inflight.fetch_add(1);
    {
      std::lock_guard<std::mutex> g(qm_);
      pending_.push_back(std::move(req));
    }
    qcv_.notify_one();
  }

  static std::string http_frame(int code, const std::string& body) {
    const char* status = code == 200 ? "200 OK"
                         : code == 400 ? "400 Bad Request"
                         : code == 404 ? "404 Not Found"
                         : code == 405 ? "405 Method Not Allowed"
                                       : "500 Internal Server Error";
    char hdr[160];
    int m = snprintf(hdr, sizeof hdr,
                     "HTTP/1.1 %s\r\nContent-Type: application/json\r\n"
                     "Content-Length: %zu\r\n\r\n",
                     status, body.size());
    std::string out;
    out.reserve(m + body.size());
    out.append(hdr, m);
    out += body;
    return out;
  }

  // IO-thread immediate responses (errors, healthz) keep FIFO order per
  // connection only when nothing is in flight on it; with in-flight
  // batched requests the reply is routed through the dispatcher queue.
  void respond_now(const std::shared_ptr<Conn>& c, int code,
                   const std::string& body) {
    if (c->inflight.load() > 0) {
      Request req;
      req.conn = c;
      req.top = -code;  // pre-formed response marker
      req.query = body;
      c->inflight.fetch_add(1);
      std::lock_guard<std::mutex> g(qm_);
      pending_.push_back(std::move(req));
      qcv_.notify_one();
      return;
    }
    append_out(c, http_frame(code, body));
    flush(c);
  }

  void append_out(const std::shared_ptr<Conn>& c, const std::string& bytes) {
    std::lock_guard<std::mutex> g(c->m);
    c->out += bytes;
  }

  // header + body appended under one lock, no intermediate frame string
  void append_response(const std::shared_ptr<Conn>& c, int code,
                       const std::string& body) {
    const char* status = code == 200 ? "200 OK"
                                     : "500 Internal Server Error";
    char hdr[160];
    int m = snprintf(hdr, sizeof hdr,
                     "HTTP/1.1 %s\r\nContent-Type: application/json\r\n"
                     "Content-Length: %zu\r\n\r\n",
                     status, body.size());
    std::lock_guard<std::mutex> g(c->m);
    c->out.append(hdr, m);
    c->out += body;
  }

  void flush_all() {
    for (auto it = conns_.begin(); it != conns_.end();) {
      auto c = it->second;
      ++it;
      flush(c);
    }
  }

  void flush(const std::shared_ptr<Conn>& c) {
    if (c->closed.load()) return;
    std::unique_lock<std::mutex> g(c->m);
    while (!c->out.empty()) {
      ssize_t w = send(c->fd, c->out.data(), c->out.size(), MSG_NOSIGNAL);
      if (w > 0) {
        c->out.erase(0, static_cast<size_t>(w));
      } else if (w < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        break;
      } else {
        g.unlock();
        drop(c);
        return;
      }
    }
    bool need = !c->out.empty();
    g.unlock();
    if (need != c->want_write) {
      c->want_write = need;
      epoll_event ev{};
      ev.events = EPOLLIN | (need ? EPOLLOUT : 0);
      ev.data.fd = c->fd;
      epoll_ctl(ep_, EPOLL_CTL_MOD, c->fd, &ev);
    }
  }

  // ---- dispatcher thread ---------------------------------------------------
  void dispatch_loop() {
    std::vector<Request> group;
    std::vector<int32_t> offsets;
    std::string blob;
    std::vector<int32_t> idx;
    std::vector<float> scores;
    std::string body;
    while (!stopping_.load()) {
      group.clear();
      {
        std::unique_lock<std::mutex> g(qm_);
        qcv_.wait(g, [this] { return !pending_.empty() || stopping_.load(); });
        if (stopping_.load()) break;
        drain_locked(group);
        if (static_cast<int>(group.size()) < max_batch_) {
          auto t_end = std::chrono::steady_clock::now() +
                       std::chrono::microseconds(max_wait_us_);
          while (static_cast<int>(group.size()) < max_batch_ &&
                 !stopping_.load()) {
            if (qcv_.wait_until(g, t_end) == std::cv_status::timeout) {
              drain_locked(group);
              break;
            }
            drain_locked(group);
          }
        }
      }
      if (group.empty()) continue;

      // run the batch callback over the live /search requests first...
      int n_live = 0;
      for (auto& r : group)
        if (r.top > 0) ++n_live;
      int rc = 0;
      if (n_live > 0) {
        offsets.assign(1, 0);
        blob.clear();
        for (auto& r : group) {
          if (r.top <= 0) continue;
          blob += r.query;
          offsets.push_back(static_cast<int32_t>(blob.size()));
        }
        idx.resize(static_cast<size_t>(n_live) * max_top_);
        scores.resize(static_cast<size_t>(n_live) * max_top_);
        rc = cb_(user_, blob.data(), offsets.data(), n_live, max_top_,
                 idx.data(), scores.data());
        n_batches_.fetch_add(1);
        n_batched_reqs_.fetch_add(static_cast<uint64_t>(n_live));
        if (rc != 0) n_errors_.fetch_add(static_cast<uint64_t>(n_live));
      }
      // ...then ship ALL responses in group (= arrival) order, so live and
      // pre-formed (queued error) replies on one pipelined connection keep
      // HTTP's required FIFO order
      int row = 0;
      for (auto& r : group) {
        if (r.top <= 0) {
          append_out(r.conn, http_frame(-r.top, r.query));
        } else if (rc != 0) {
          append_response(r.conn, 500,
                          "{\"error\":\"batch callback failed\"}");
          ++row;
        } else {
          format_result(body, r.query, &idx[size_t(row) * max_top_],
                        &scores[size_t(row) * max_top_], r.top);
          append_response(r.conn, 200, body);
          ++row;
        }
        r.conn->inflight.fetch_sub(1);
      }
      wake();  // IO thread flushes all updated connections
    }
  }

  void drain_locked(std::vector<Request>& group) {
    while (!pending_.empty() &&
           static_cast<int>(group.size()) < max_batch_) {
      group.push_back(std::move(pending_.front()));
      pending_.pop_front();
    }
  }

  // fast float -> "%.4f"-style text for well-behaved scores (the hot path:
  // k floats per response); snprintf for huge-but-finite. Non-finite
  // scores become JSON null — bare nan/inf tokens are invalid per RFC
  // 8259 (serving_http.py makes the same choice, so the two frontends
  // agree on degenerate scores).
  static char* fmt_score(char* p, float v) {
    double d = static_cast<double>(v);
    if (!std::isfinite(d)) {
      memcpy(p, "null", 4);
      return p + 4;
    }
    if (!(d > -1e7 && d < 1e7)) {
      return p + snprintf(p, 24, "%.6g", d);
    }
    if (d < 0) {
      *p++ = '-';
      d = -d;
    }
    uint64_t scaled = static_cast<uint64_t>(d * 10000.0 + 0.5);
    uint64_t ip = scaled / 10000, fp = scaled % 10000;
    char tmp[16];
    int n = 0;
    do {
      tmp[n++] = static_cast<char>('0' + ip % 10);
      ip /= 10;
    } while (ip);
    while (n) *p++ = tmp[--n];
    *p++ = '.';
    p[3] = static_cast<char>('0' + fp % 10); fp /= 10;
    p[2] = static_cast<char>('0' + fp % 10); fp /= 10;
    p[1] = static_cast<char>('0' + fp % 10); fp /= 10;
    p[0] = static_cast<char>('0' + fp % 10);
    return p + 4;
  }

  void format_result(std::string& body, const std::string& query,
                     const int32_t* idx, const float* scores, int top) {
    body.clear();
    body += "{\"query\":\"";
    body += json_escape(query);
    body += "\",\"results\":[";
    char num[32];
    for (int j = 0; j < top; ++j) {
      if (j) body += ',';
      body += '[';
      uint32_t id = static_cast<uint32_t>(idx[j]);
      if (id < ids_json_.size()) {
        body += ids_json_[id];
      } else {
        body += "null";
      }
      body += ',';
      body.append(num, fmt_score(num, scores[j]) - num);
      body += ']';
    }
    body += "]}";
  }

  int listen_fd_ = -1, ep_ = -1, wake_fd_ = -1, port_ = 0, err_ = 0;
  int max_batch_;
  int64_t max_wait_us_;
  int max_top_;
  int default_top_;
  ld_batch_cb cb_;
  void* user_;
  std::thread io_, disp_;
  std::atomic<bool> stopping_{false};
  std::map<int, std::shared_ptr<Conn>> conns_;  // IO thread only
  std::mutex qm_;
  std::condition_variable qcv_;
  std::deque<Request> pending_;
  std::vector<std::string> ids_json_;
  size_t corpus_n_ = 0;
  std::atomic<uint64_t> n_requests_{0}, n_batches_{0}, n_batched_reqs_{0},
      n_errors_{0};
};

std::mutex g_reg_m;
std::map<int, std::unique_ptr<Server>> g_servers;
int g_next_handle = 1;

}  // namespace

extern "C" {

int ldserve_start(int port, int max_batch, double max_wait_ms, int max_top,
                  const char* ids_blob, const int32_t* ids_off, int n_ids,
                  ld_batch_cb cb, void* user) {
  std::vector<std::string> ids;
  ids.reserve(static_cast<size_t>(n_ids));
  for (int i = 0; i < n_ids; ++i)
    ids.emplace_back(ids_blob + ids_off[i],
                     static_cast<size_t>(ids_off[i + 1] - ids_off[i]));
  auto s = std::make_unique<Server>(port, max_batch, max_wait_ms, max_top,
                                    std::move(ids), cb, user);
  if (s->error()) return -s->error();
  std::lock_guard<std::mutex> g(g_reg_m);
  int h = g_next_handle++;
  g_servers[h] = std::move(s);
  return h;
}

int ldserve_port(int handle) {
  std::lock_guard<std::mutex> g(g_reg_m);
  auto it = g_servers.find(handle);
  return it == g_servers.end() ? -1 : it->second->port();
}

void ldserve_stats(int handle, uint64_t* out4) {
  std::lock_guard<std::mutex> g(g_reg_m);
  auto it = g_servers.find(handle);
  if (it != g_servers.end()) it->second->stats(out4);
}

void ldserve_stop(int handle) {
  std::unique_ptr<Server> s;
  {
    std::lock_guard<std::mutex> g(g_reg_m);
    auto it = g_servers.find(handle);
    if (it == g_servers.end()) return;
    s = std::move(it->second);
    g_servers.erase(it);
  }
  s->stop();
}

}  // extern "C"
