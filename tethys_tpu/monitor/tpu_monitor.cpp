// TPU chip-utilization monitor daemon — the TPU-native equivalent of the
// reference's NVML GPU sampler (reference NVML/NVML.cpp:1-93).
//
// Design: libtpu exposes no public C utilization API (there is no NVML for
// TPU), so the runtime side of the split lives in the training process: the
// Python bridge (tethys_tpu/monitor/bridge.py) publishes per-device metrics
// (device duty-cycle utilization, HBM bytes in use / capacity from
// device.memory_stats()) into a small text file at a fixed path, atomically
// (write-to-temp + rename).  This daemon samples that file at ~6 Hz — the
// same 166.667 ms cadence as the reference, compensating for read time —
// and emits lines in the reference's exact format so existing scrapers keep
// working (the "GPU Util"/"Mem Util" field labels are kept deliberately):
//
//   H:M:S:ms  Device 0: TPU v5e  GPU Util: 87  Mem Util: 41 Mem Usage: 6871947673
//
// Metrics file format (one device per line):
//   idx|name|util_percent|mem_util_percent|mem_bytes
//
// Usage: tpu_monitor [metrics_file]
//   metrics_file defaults to $TETHYS_TPU_METRICS or /tmp/tethys_tpu_metrics.
// SIGINT flips the run flag and exits cleanly, like the reference daemon.

#include <cerrno>
#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <string>
#include <vector>

#include <sys/time.h>
#include <sys/timeb.h>
#include <unistd.h>

static volatile sig_atomic_t g_run = 1;

static void signal_handler(int) {
  g_run = 0;
}

struct DeviceMetrics {
  int index = 0;
  std::string name = "TPU";
  unsigned util = 0;      // duty-cycle utilization percent
  unsigned mem_util = 0;  // HBM in-use percent
  long long mem_bytes = 0;
};

// Parse "idx|name|util|mem_util|mem_bytes" lines.  Returns an empty vector
// when the file is missing (bridge not up yet) — the daemon then reports a
// single placeholder device with zeros, so the log cadence is unbroken.
static std::vector<DeviceMetrics> read_metrics(const char* path) {
  std::vector<DeviceMetrics> devices;
  FILE* f = std::fopen(path, "r");
  if (f == nullptr) return devices;
  char line[512];
  while (std::fgets(line, sizeof(line), f) != nullptr) {
    DeviceMetrics d;
    char name[256] = {0};
    long long mem = 0;
    unsigned util = 0, mem_util = 0;
    int idx = 0;
    if (std::sscanf(line, "%d|%255[^|]|%u|%u|%lld",
                    &idx, name, &util, &mem_util, &mem) == 5) {
      d.index = idx;
      d.name = name;
      d.util = util;
      d.mem_util = mem_util;
      d.mem_bytes = mem;
      devices.push_back(d);
    }
  }
  std::fclose(f);
  return devices;
}

int main(int argc, char* argv[]) {
  std::signal(SIGINT, signal_handler);
  std::signal(SIGTERM, signal_handler);
  setvbuf(stdout, nullptr, _IONBF, 0);  // unbuffered, like the reference

  const char* path = nullptr;
  if (argc > 1) {
    path = argv[1];
  } else {
    path = std::getenv("TETHYS_TPU_METRICS");
    if (path == nullptr) path = "/tmp/tethys_tpu_metrics";
  }

  const long kPeriodUs = 166667;  // ~6 Hz, reference cadence

  while (g_run) {
    struct timeval start, fin;
    gettimeofday(&start, nullptr);

    time_t now = time(nullptr);
    struct tm tm_now;
    localtime_r(&now, &tm_now);
    struct timeb timer_msec;
    ftime(&timer_msec);

    std::vector<DeviceMetrics> devices = read_metrics(path);
    if (devices.empty()) {
      DeviceMetrics placeholder;
      placeholder.name = "TPU (bridge not publishing)";
      devices.push_back(placeholder);
    }
    for (const DeviceMetrics& d : devices) {
      std::printf("%d:%d:%d:%d  ", tm_now.tm_hour, tm_now.tm_min,
                  tm_now.tm_sec, timer_msec.millitm);
      std::printf("Device %d: %s  ", d.index, d.name.c_str());
      std::printf("GPU Util: %u  Mem Util: %u Mem Usage: %lli\n ",
                  d.util, d.mem_util, d.mem_bytes);
    }

    gettimeofday(&fin, nullptr);
    long elapsed = (fin.tv_sec - start.tv_sec) * 1000000L +
                   (fin.tv_usec - start.tv_usec);
    long sleep_us = kPeriodUs - elapsed;
    if (sleep_us > 0) usleep(static_cast<useconds_t>(sleep_us));
  }
  return 0;
}
