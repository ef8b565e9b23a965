// Minimal libsndfile API stub so the reference's AudioBuffer.cpp compiles
// out-of-tree on a box without libsndfile-dev. Only the declarations the
// reference translation unit needs; every function aborts if actually
// called — the oracle drivers never touch the load/save paths (audio is
// constructed in memory). This keeps the REAL compiled reference code for
// everything else in AudioBuffer.cpp (ctors, get_sample, mix-downs).
#pragma once
#include <cstdint>
#include <cstdio>
#include <cstdlib>

extern "C" {

typedef struct SNDFILE_tag SNDFILE;
typedef int64_t sf_count_t;

typedef struct SF_INFO {
    sf_count_t frames;
    int samplerate;
    int channels;
    int format;
    int sections;
    int seekable;
} SF_INFO;

enum {
    SFM_READ = 0x10,
    SFM_WRITE = 0x20,
    SF_FORMAT_WAV = 0x010000,
    SF_FORMAT_PCM_24 = 0x0003,
    SF_STR_TITLE = 0x01,
    SF_STR_COPYRIGHT = 0x02,
    SF_STR_SOFTWARE = 0x03,
    SF_STR_ARTIST = 0x04,
    SF_STR_COMMENT = 0x05,
    SF_STR_DATE = 0x06,
    SF_STR_ALBUM = 0x07,
    SF_STR_LICENSE = 0x08,
    SF_STR_TRACKNUMBER = 0x09,
    SF_STR_GENRE = 0x10,
};

#define FLAN_ORACLE_SF_ABORT                                           \
    do {                                                               \
        std::fprintf(stderr,                                           \
                     "oracle sndfile stub called: %s\n", __func__);    \
        std::abort();                                                  \
    } while (0)

inline SNDFILE* sf_open(const char*, int, SF_INFO*) { FLAN_ORACLE_SF_ABORT; }
inline sf_count_t sf_readf_float(SNDFILE*, float*, sf_count_t) {
    FLAN_ORACLE_SF_ABORT;
}
inline sf_count_t sf_writef_float(SNDFILE*, const float*, sf_count_t) {
    FLAN_ORACLE_SF_ABORT;
}
inline int sf_close(SNDFILE*) { FLAN_ORACLE_SF_ABORT; }
inline const char* sf_strerror(SNDFILE*) { FLAN_ORACLE_SF_ABORT; }
inline int sf_format_check(const SF_INFO*) { FLAN_ORACLE_SF_ABORT; }
inline const char* sf_get_string(SNDFILE*, int) { FLAN_ORACLE_SF_ABORT; }
inline int sf_set_string(SNDFILE*, int, const char*) {
    FLAN_ORACLE_SF_ABORT;
}

}  // extern "C"
