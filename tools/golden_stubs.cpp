// Minimal stubs so reference DSP translation units link without the full
// odr-dabmod runtime (no ZMQ, no Log backends, no RC servers).
#include <string>
#include <list>
#include <map>

#include "RemoteControl.h"
#include "Log.h"

// Globals normally defined in lib/Globals.cpp
RemoteControllers rcs;
Logger etiLog;

// --- Logger stubs (lib/Log.cpp replacements) ---
Logger::Logger() {}
Logger::~Logger() {}
void Logger::logstr(log_level_t level, std::string&& message) { (void)level; (void)message; }
void Logger::log(log_level_t level, const char* fmt, ...) { (void)level; (void)fmt; }
LogLine Logger::level(log_level_t level) { return LogLine(this, level); }
void Logger::register_backend(std::shared_ptr<LogBackend> backend) { (void)backend; }

// --- RemoteControllers stubs (lib/RemoteControl.cpp replacements) ---
void RemoteControllers::enrol(RemoteControllable* rc) { (void)rc; }
void RemoteControllers::remove_controllable(RemoteControllable* rc) { (void)rc; }
std::string RemoteControllers::get_param(const std::string& name, const std::string& param) {
    (void)name; (void)param; return "";
}

RemoteControllable::~RemoteControllable() {
    rcs.remove_controllable(this);
}

std::list<std::string> RemoteControllable::get_supported_parameters() const {
    std::list<std::string> parameterlist;
    for (const auto& param : m_parameters) {
        parameterlist.push_back(param[0]);
    }
    return parameterlist;
}

// --- Utils stubs (src/Utils.cpp replacements) ---
void set_thread_name(const char* name) { (void)name; }
int set_realtime_prio(int prio) { (void)prio; return 0; }

// --- fftw3f stubs (tools/shim/fftw3.h declarations): the harness only
// instantiates OfdmGeneratorFixed, so the CF32 path's calls must never run.
#include <cstdio>
#include <cstdlib>
#include "fftw3.h"      // the tools/shim copy
extern "C" {
void* fftwf_malloc(size_t n) { return malloc(n); }
void fftwf_free(void* p) { free(p); }
fftwf_plan fftwf_plan_dft_1d(int, fftwf_complex*, fftwf_complex*, int,
                             unsigned) { return nullptr; }
void fftwf_destroy_plan(fftwf_plan) {}
void fftwf_execute(const fftwf_plan) {
    fprintf(stderr, "fftwf_execute stub called\n");
    abort();
}
void fftwf_set_timelimit(double) {}
}
