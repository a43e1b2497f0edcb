// Force-included (g++ -include) ahead of the reference translation unit:
// pre-defines every include guard of the reference's vendored
// indicators.h (4,762 lines of progress-bar UI) so its contents compile
// to nothing, and supplies no-op versions of the three symbols the
// reference kernel actually touches (ldscalc.h:9-11,59,62:
// show_console_cursor, get_ld_progress_bar -> ProgressBar, .tick()).
#pragma once

#define INDICATORS_BLOCK_PROGRESS_BAR
#define INDICATORS_COLOR
#define INDICATORS_CURSOR_CONTROL
#define INDICATORS_CURSOR_MOVEMENT
#define INDICATORS_DISPLAY_WIDTH
#define INDICATORS_DYNAMIC_PROGRESS
#define INDICATORS_FONT_STYLE
#define INDICATORS_INDETERMINATE_PROGRESS_BAR
#define INDICATORS_MULTI_PROGRESS
#define INDICATORS_PROGRESS_BAR
#define INDICATORS_PROGRESS_SPINNER
#define INDICATORS_PROGRESS_TYPE
#define INDICATORS_SETTING
#define INDICATORS_STREAM_HELPER
#define INDICATORS_TERMINAL_SIZE
#define TERMCOLOR_HPP_

#include <cstddef>

namespace indicators {

inline void show_console_cursor(bool) {}

struct ProgressBar {
    void tick() {}
};

inline ProgressBar get_ld_progress_bar(std::size_t) { return {}; }

} // namespace indicators
