// pjrt_runner: execute an exported StableHLO bundle on a PJRT plugin.
//
//   pjrt_runner --plugin=/opt/axon/libaxon_pjrt.so --bundle=DIR \
//       [--opt k=v]... [--iopt k=v]... [--feed=ARGIDX:FILE]... \
//       [--iters=N] [--warmup=N] [--dump=out_prefix]
//
// The bundle (written by asv_subtools_tpu.export.export_pjrt_bundle) is:
//   manifest.txt        line-based arg/output specs (see export.py)
//   model.mlir          StableHLO module text
//   compile_options.pb  serialized xla CompileOptionsProto
//   params.bin          concatenated baked parameter leaves
//
// Runtime args not baked into params.bin are fed from --feed files or
// zero-filled. This gives a fully native serve path: no Python anywhere.
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "../pjrt/bundle.h"
#include "../pjrt/pjrt_executor.h"

using asvtpu::ArgSpec;
using asvtpu::Bundle;
using asvtpu::ClientOption;
using asvtpu::LoadBundle;
using asvtpu::ReadFileToString;
using asvtpu::DtypeBytes;
using asvtpu::HostArray;
using asvtpu::PjrtExecutor;

namespace {

float Bf16ToF32(uint16_t v) {
  uint32_t bits = static_cast<uint32_t>(v) << 16;
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

void Summarize(const HostArray& a, int idx) {
  double sum = 0, sumsq = 0;
  size_t n = a.num_elements();
  if (a.dtype == "f32") {
    const float* p = reinterpret_cast<const float*>(a.data.data());
    for (size_t i = 0; i < n; ++i) {
      sum += p[i];
      sumsq += double(p[i]) * p[i];
    }
  } else if (a.dtype == "bf16") {
    const uint16_t* p = reinterpret_cast<const uint16_t*>(a.data.data());
    for (size_t i = 0; i < n; ++i) {
      float v = Bf16ToF32(p[i]);
      sum += v;
      sumsq += double(v) * v;
    }
  }
  std::printf("output[%d] dtype=%s dims=[", idx, a.dtype.c_str());
  for (size_t i = 0; i < a.dims.size(); ++i)
    std::printf("%s%lld", i ? "," : "", (long long)a.dims[i]);
  std::printf("] mean=%.6g rms=%.6g\n", n ? sum / n : 0.0,
              n ? std::sqrt(sumsq / n) : 0.0);
}

}  // namespace

int main(int argc, char** argv) {
  std::string plugin, bundle_dir, dump_prefix;
  std::vector<ClientOption> opts;
  std::map<int, std::string> feeds;
  int iters = 1, warmup = 0;

  for (int i = 1; i < argc; ++i) {
    std::string arg = argv[i];
    auto val = [&](const char* prefix) {
      return arg.substr(std::strlen(prefix));
    };
    if (arg.rfind("--plugin=", 0) == 0) {
      plugin = val("--plugin=");
    } else if (arg.rfind("--bundle=", 0) == 0) {
      bundle_dir = val("--bundle=");
    } else if (arg.rfind("--iters=", 0) == 0) {
      iters = std::atoi(val("--iters=").c_str());
    } else if (arg.rfind("--warmup=", 0) == 0) {
      warmup = std::atoi(val("--warmup=").c_str());
    } else if (arg.rfind("--dump=", 0) == 0) {
      dump_prefix = val("--dump=");
    } else if (arg.rfind("--opt=", 0) == 0 || arg.rfind("--iopt=", 0) == 0) {
      bool is_int = arg[2] == 'i';
      std::string kv = val(is_int ? "--iopt=" : "--opt=");
      size_t eq = kv.find('=');
      if (eq == std::string::npos) {
        std::fprintf(stderr, "bad option %s\n", arg.c_str());
        return 2;
      }
      ClientOption o;
      o.name = kv.substr(0, eq);
      if (is_int) {
        o.is_string = false;
        o.int_value = std::atoll(kv.substr(eq + 1).c_str());
      } else {
        o.str_value = kv.substr(eq + 1);
      }
      opts.push_back(o);
    } else if (arg.rfind("--feed=", 0) == 0) {
      std::string kv = val("--feed=");
      size_t colon = kv.find(':');
      feeds[std::atoi(kv.substr(0, colon).c_str())] = kv.substr(colon + 1);
    } else {
      std::fprintf(stderr, "unknown arg %s\n", arg.c_str());
      return 2;
    }
  }
  if (plugin.empty() || bundle_dir.empty()) {
    std::fprintf(stderr,
                 "usage: pjrt_runner --plugin=PLUGIN.so --bundle=DIR "
                 "[--opt k=v] [--iopt k=v] [--feed idx:file] [--iters N]\n");
    return 2;
  }

  Bundle bundle;
  std::string error;
  if (!LoadBundle(bundle_dir, &bundle, &error)) {
    std::fprintf(stderr, "bundle: %s\n", error.c_str());
    return 1;
  }
  std::printf("bundle: %zu args, mlir %zu bytes, params %zu bytes\n",
              bundle.args.size(), bundle.mlir.size(), bundle.params.size());

  auto t0 = std::chrono::steady_clock::now();
  auto ex = PjrtExecutor::Create(plugin, opts, &error);
  if (!ex) {
    std::fprintf(stderr, "client: %s\n", error.c_str());
    return 1;
  }
  auto t1 = std::chrono::steady_clock::now();
  std::printf("client: platform=%s version=%s devices=%d (%.1f ms)\n",
              ex->platform_name().c_str(), ex->platform_version().c_str(),
              ex->num_devices(),
              std::chrono::duration<double, std::milli>(t1 - t0).count());

  if (!ex->Compile(bundle.mlir, bundle.compile_options, &error)) {
    std::fprintf(stderr, "compile: %s\n", error.c_str());
    return 1;
  }
  auto t2 = std::chrono::steady_clock::now();
  std::printf("compiled: %zu outputs (%.1f ms)\n", ex->num_outputs(),
              std::chrono::duration<double, std::milli>(t2 - t1).count());

  // Materialize inputs.
  std::vector<HostArray> inputs(bundle.args.size());
  for (size_t i = 0; i < bundle.args.size(); ++i) {
    const ArgSpec& spec = bundle.args[i];
    HostArray& in = inputs[i];
    in.dtype = spec.dtype;
    in.dims = spec.dims;
    size_t want = in.num_elements() * DtypeBytes(spec.dtype);
    if (spec.baked) {
      if (spec.offset + spec.nbytes > bundle.params.size() ||
          spec.nbytes != want) {
        std::fprintf(stderr, "arg %zu: bad params range\n", i);
        return 1;
      }
      in.data.assign(bundle.params.begin() + spec.offset,
                     bundle.params.begin() + spec.offset + spec.nbytes);
    } else if (feeds.count(static_cast<int>(i))) {
      bool ok = false;
      std::string raw = ReadFileToString(feeds[i], &ok);
      if (!ok || raw.size() != want) {
        std::fprintf(stderr, "arg %zu: feed size %zu != %zu\n", i, raw.size(),
                     want);
        return 1;
      }
      in.data.assign(raw.begin(), raw.end());
    } else {
      in.data.assign(want, 0);
    }
  }

  // Baked (weight) args upload once and stay resident, as in serving.
  std::vector<bool> persistent(bundle.args.size(), false);
  for (size_t i = 0; i < bundle.args.size(); ++i)
    persistent[i] = bundle.args[i].baked;
  std::vector<HostArray> outputs;
  for (int i = 0; i < warmup; ++i) {
    if (!ex->ExecuteModule(0, inputs, &outputs, &error, &persistent)) {
      std::fprintf(stderr, "execute(warmup): %s\n", error.c_str());
      return 1;
    }
  }
  auto t3 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; ++i) {
    if (!ex->ExecuteModule(0, inputs, &outputs, &error, &persistent)) {
      std::fprintf(stderr, "execute: %s\n", error.c_str());
      return 1;
    }
  }
  auto t4 = std::chrono::steady_clock::now();
  double ms =
      std::chrono::duration<double, std::milli>(t4 - t3).count() / iters;
  std::printf("execute: %.3f ms/iter (%d iters)\n", ms, iters);
  for (size_t i = 0; i < outputs.size(); ++i)
    Summarize(outputs[i], static_cast<int>(i));

  if (!dump_prefix.empty()) {
    for (size_t i = 0; i < outputs.size(); ++i) {
      std::string path = dump_prefix + std::to_string(i) + ".bin";
      std::ofstream f(path, std::ios::binary);
      f.write(reinterpret_cast<const char*>(outputs[i].data.data()),
              outputs[i].data.size());
      std::printf("wrote %s (%zu bytes)\n", path.c_str(),
                  outputs[i].data.size());
    }
  }
  return 0;
}
