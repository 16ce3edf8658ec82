/* Encoding-detection probe: drives the reference's PUBLIC
 * myencoding_detect API (myencoding/encoding.h:141) on files, printing
 * one "<file>\t<label>" line each — harness code for the round-3
 * Cyrillic-detection divergence characterization (BASELINE.md
 * §encodings). Build against the copied-out reference source like
 * tools/reference_bench/bench_main.c:
 *
 *   cp detect_probe.c /tmp/myhtml-src/
 *   cd /tmp/myhtml-src && gcc -O2 -I. -o /tmp/detect_probe detect_probe.c \
 *       $(find mycore myencoding myhtml myport/posix -name '*.c') -lpthread
 *   /tmp/detect_probe corpus/*.bin
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "myencoding/myosi.h"
#include "myencoding/encoding.h"

static const char *label(myencoding_t e) {
    switch (e) {
        case MyENCODING_UTF_8:          return "UTF-8";
        case MyENCODING_IBM866:         return "IBM866";
        case MyENCODING_ISO_8859_5:     return "ISO-8859-5";
        case MyENCODING_KOI8_R:         return "KOI8-R";
        case MyENCODING_WINDOWS_1251:   return "windows-1251";
        case MyENCODING_X_MAC_CYRILLIC: return "x-MacCyrillic";
        default: {
            static char buf[32];
            snprintf(buf, sizeof(buf), "enum-0x%02x", (unsigned)e);
            return buf;
        }
    }
}

int main(int argc, char **argv) {
    for (int i = 1; i < argc; i++) {
        FILE *f = fopen(argv[i], "rb");
        if (!f) { fprintf(stderr, "skip %s\n", argv[i]); continue; }
        static char buf[1 << 20];
        size_t n = fread(buf, 1, sizeof(buf), f);
        fclose(f);
        myencoding_t enc = MyENCODING_NOT_DETERMINED;
        bool ok = myencoding_detect(buf, n, &enc);
        printf("%s\t%s\t%s\n", argv[i], ok ? "det" : "none", label(enc));
    }
    return 0;
}
