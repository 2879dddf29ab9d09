// Auto-generated from smh_tpu/consts.toml -- do not edit.
#pragma once
#include <stdint.h>

static const int16_t CLOSE_DEPLOYMENT_BUTTON_COLOR[3] = {217, 67, 49};
static const uint16_t CLOSE_DEPLOYMENT_BUTTON_TOLERANCE = 25;
static const float CLOSE_DEPLOYMENT_BUTTON_RED_PIXEL_THRESHOLD = 0.65f;
static const uint8_t OCR_PREPROCESS_BRIGHTNESS_THRESHOLD = 200;
static const uint16_t OCR_PREPROCESS_MONOCHROMATICY_THRESHOLD = 3;
static const uint8_t OCR_PREPROCESS_BRIGHTNESS_EDGE_THRESHOLD = 130;
static const uint16_t OCR_PREPROCESS_SIMILARITY_EDGE_THRESHOLD = 48;
static const uint32_t OCR_PREPROCESS_DILATE_RADIUS = 3;
static const uint16_t ALPHA_MARKER_COLOR_HSV[3] = {105, 100, 100};
static const uint16_t BRAVO_MARKER_COLOR_HSV[3] = {285, 46, 85};
static const uint16_t CHARLIE_MARKER_COLOR_HSV[3] = {158, 60, 91};
static const uint16_t FIND_MARKER_HSV_HUE_TOLERANCE = 15;
static const uint8_t FIND_MARKER_HSV_SAT_TOLERANCE = 15;
static const uint8_t FIND_MARKER_HSV_VIB_TOLERANCE = 15;
static const uint8_t FIND_MARKER_HSV_MIN_SAT = 35;
static const int16_t FIND_MARKER_PLAYER_DIR_ARC_SAT = 50;
static const float MAP_MARKER_POI_LOCATION = 0.7f;
static const uint32_t LSD_MAX_LINES = 32;
static const uint32_t LSD_MAX_GAP = 15;
static const float LSD_MIN_LENGTH_SQR = 2500.0f;
static const float LSD_DEDUP_DIST_SQR = 50.0f;
static const float LSD_CENTRE_MAX_DIST = 5.0f;
static const uint32_t LSD_NUM_ANGLES = 3600;
static const uint32_t VISION_FPS = 15;
static const uint32_t CAPTURE_HZ = 20;
