// SqueezeDet-TPU native KITTI 2D detection evaluator.
//
// A from-scratch implementation of the official KITTI devkit 2D AP protocol
// (semantics mirrored from the reference's bundled evaluator,
// src/utils/kitti-eval/cpp/evaluate_object.cpp — same CLI contract and
// output files so mAP numbers are directly comparable):
//
//   kitti_eval <gt_training_dir> <image_set_file> <result_dir> <num_images>
//
// Protocol summary:
//  * classes car / pedestrian / cyclist, min IoU 0.7 / 0.5 / 0.5
//  * difficulties easy/moderate/hard gated on bbox height (40/25/25),
//    occlusion (0/1/2) and truncation (.15/.3/.5)
//  * neighbouring classes (van->car, person_sitting->pedestrian) and
//    difficulty-filtered ground truth are "ignored": they absorb detections
//    without counting as TP or FN
//  * DontCare regions absorb otherwise-unmatched detections when
//    intersection/det_area exceeds the class min overlap
//  * 41 recall sample points; score thresholds chosen from the sorted TP
//    scores of a matching pre-pass; precision is monotonicised from the
//    right; AP = mean of every 4th of the 41 samples (11-point AP)
//  * orientation similarity (AOS) = (1+cos(dalpha))/2 over TPs, 0 for FPs
//
// Outputs in <result_dir>: stats_<cls>_ap.txt (3 lines "AP=x"),
// stats_<cls>_detection.txt (11 precision samples per difficulty row),
// stats_<cls>_orientation.txt, and plot/<cls>_detection.txt curve data.

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

constexpr int kNumSamplePts = 41;
constexpr int kNumDifficulties = 3;

const char* kClassNames[] = {"car", "pedestrian", "cyclist"};
constexpr int kNumClasses = 3;
constexpr double kMinOverlap[kNumClasses] = {0.7, 0.5, 0.5};

constexpr int kMinHeight[kNumDifficulties] = {40, 25, 25};
constexpr int kMaxOcclusion[kNumDifficulties] = {0, 1, 2};
constexpr double kMaxTruncation[kNumDifficulties] = {0.15, 0.30, 0.50};

struct Box {
  double x1 = 0, y1 = 0, x2 = 0, y2 = 0;
  double alpha = -10;
};

struct GtObject {
  std::string type;
  Box box;
  double truncation = -1;
  int occlusion = -1;
};

struct Detection {
  std::string type;
  Box box;
  double score = -1e9;
};

struct FrameStats {
  std::vector<double> tp_scores;  // scores of TPs (threshold pre-pass)
  double similarity = 0;          // summed AOS terms, or -1 if no TP/FP
  int tp = 0, fp = 0, fn = 0;
};

bool IEquals(const std::string& a, const char* b) {
  return strcasecmp(a.c_str(), b) == 0;
}

// IoU (criterion<0) or intersection-over-area-of-a (criterion==0).
double Overlap(const Box& a, const Box& b, int criterion = -1) {
  const double w = std::min(a.x2, b.x2) - std::max(a.x1, b.x1);
  const double h = std::min(a.y2, b.y2) - std::max(a.y1, b.y1);
  if (w <= 0 || h <= 0) return 0.0;
  const double inter = w * h;
  const double area_a = (a.x2 - a.x1) * (a.y2 - a.y1);
  if (criterion == 0) return inter / area_a;
  const double area_b = (b.x2 - b.x1) * (b.y2 - b.y1);
  return inter / (area_a + area_b - inter);
}

std::vector<GtObject> LoadGroundtruth(const std::string& path, bool* ok) {
  std::vector<GtObject> out;
  std::ifstream in(path);
  if (!in) {
    *ok = false;
    return out;
  }
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    GtObject g;
    double trash;
    if (ss >> g.type >> g.truncation >> g.occlusion >> g.box.alpha >>
        g.box.x1 >> g.box.y1 >> g.box.x2 >> g.box.y2 >> trash >> trash >>
        trash >> trash >> trash >> trash >> trash) {
      out.push_back(g);
    }
  }
  *ok = true;
  return out;
}

std::vector<Detection> LoadDetections(const std::string& path, bool* ok,
                                      bool* compute_aos,
                                      bool class_seen[kNumClasses]) {
  std::vector<Detection> out;
  std::ifstream in(path);
  if (!in) {
    *ok = false;
    return out;
  }
  std::string line;
  while (std::getline(in, line)) {
    std::istringstream ss(line);
    Detection d;
    double trash;
    if (ss >> d.type >> trash >> trash >> d.box.alpha >> d.box.x1 >>
        d.box.y1 >> d.box.x2 >> d.box.y2 >> trash >> trash >> trash >>
        trash >> trash >> trash >> trash >> d.score) {
      out.push_back(d);
      if (d.box.alpha == -10) *compute_aos = false;
      for (int c = 0; c < kNumClasses; ++c)
        if (IEquals(d.type, kClassNames[c])) class_seen[c] = true;
    }
  }
  *ok = true;
  return out;
}

// Per-frame filtering: classify each gt as counted (0), ignored (1) or
// other-class (-1); detections as current-class (0) or other (-1); collect
// DontCare regions; accumulate the recall denominator.
void CleanFrame(int cls, int difficulty, const std::vector<GtObject>& gt,
                const std::vector<Detection>& det,
                std::vector<int>* gt_flags, std::vector<int>* det_flags,
                std::vector<Box>* dontcare, int* n_counted_gt) {
  for (const auto& g : gt) {
    int class_relation;  // 1 = same class, 0 = neighbour, -1 = other
    if (IEquals(g.type, kClassNames[cls])) {
      class_relation = 1;
    } else if (cls == 1 && IEquals(g.type, "Person_sitting")) {
      class_relation = 0;
    } else if (cls == 0 && IEquals(g.type, "Van")) {
      class_relation = 0;
    } else {
      class_relation = -1;
    }

    const double height = g.box.y2 - g.box.y1;
    const bool hard_enough = g.occlusion <= kMaxOcclusion[difficulty] &&
                             g.truncation <= kMaxTruncation[difficulty] &&
                             height >= kMinHeight[difficulty];

    if (class_relation == 1 && hard_enough) {
      gt_flags->push_back(0);
      ++*n_counted_gt;
    } else if (class_relation == 0 || class_relation == 1) {
      gt_flags->push_back(1);
    } else {
      gt_flags->push_back(-1);
    }

    if (IEquals(g.type, "DontCare")) dontcare->push_back(g.box);
  }

  // Note: only 0 / -1 are ever emitted for detections. The official KITTI
  // devkit additionally flags detections below MIN_HEIGHT as ignored (1);
  // the reference bundles a modified devkit that intentionally dropped that
  // rule (reference evaluate_object.cpp:327-342 emits only 0/-1 too), and we
  // match it for bit-identical stats. MatchFrame keeps the det_flags==1
  // branches so the full devkit protocol is one CleanFrame change away.
  for (const auto& d : det)
    det_flags->push_back(IEquals(d.type, kClassNames[cls]) ? 0 : -1);
}

// One frame's greedy gt<->det assignment. When score_threshold is NaN the
// call is the threshold pre-pass (match by highest score, no FP counting);
// otherwise TP/FP/FN are computed at that threshold.
FrameStats MatchFrame(int cls, const std::vector<GtObject>& gt,
                      const std::vector<Detection>& det,
                      const std::vector<Box>& dontcare,
                      const std::vector<int>& gt_flags,
                      const std::vector<int>& det_flags, bool count_fp,
                      bool compute_aos, double score_threshold) {
  FrameStats stat;
  const double min_overlap = kMinOverlap[cls];

  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> below_threshold(det.size(), false);
  if (count_fp) {
    for (size_t j = 0; j < det.size(); ++j)
      if (det[j].score < score_threshold) below_threshold[j] = true;
  }

  std::vector<double> angle_deltas;

  for (size_t i = 0; i < gt.size(); ++i) {
    if (gt_flags[i] == -1) continue;

    int best = -1;
    bool found = false;
    double best_score = -1e18;
    double best_overlap = 0;
    bool best_is_ignored_det = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (det_flags[j] == -1 || assigned[j] || below_threshold[j]) continue;
      const double ov = Overlap(det[j].box, gt[i].box);
      if (ov <= min_overlap) continue;

      if (!count_fp) {
        // pre-pass: highest-scoring candidate wins
        if (det[j].score > best_score) {
          best = static_cast<int>(j);
          best_score = det[j].score;
          found = true;
        }
      } else if (det_flags[j] == 0 &&
                 (ov > best_overlap || best_is_ignored_det)) {
        best_overlap = ov;
        best = static_cast<int>(j);
        found = true;
        best_is_ignored_det = false;
      } else if (det_flags[j] == 1 && !found) {
        best = static_cast<int>(j);
        found = true;
        best_is_ignored_det = true;
      }
    }

    if (!found) {
      if (gt_flags[i] == 0) ++stat.fn;
    } else if (gt_flags[i] == 1 || det_flags[best] == 1) {
      assigned[best] = true;
    } else {
      ++stat.tp;
      stat.tp_scores.push_back(det[best].score);
      if (compute_aos)
        angle_deltas.push_back(gt[i].box.alpha - det[best].box.alpha);
      assigned[best] = true;
    }
  }

  if (count_fp) {
    for (size_t j = 0; j < det.size(); ++j)
      if (!assigned[j] && det_flags[j] == 0 && !below_threshold[j]) ++stat.fp;

    // subtract detections swallowed by DontCare regions
    int absorbed = 0;
    for (const auto& dc : dontcare) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || det_flags[j] != 0 || below_threshold[j]) continue;
        if (Overlap(det[j].box, dc, 0) > min_overlap) {
          assigned[j] = true;
          ++absorbed;
        }
      }
    }
    stat.fp -= absorbed;

    if (compute_aos) {
      double sum = 0;
      for (double d : angle_deltas) sum += (1.0 + std::cos(d)) / 2.0;
      // FPs contribute similarity 0 but count in the denominator later.
      stat.similarity = (stat.tp > 0 || stat.fp > 0) ? sum : -1;
    }
  }
  return stat;
}

// Pick score thresholds hitting ~evenly spaced recall points (41 samples).
std::vector<double> RecallThresholds(std::vector<double> scores,
                                     double n_gt) {
  std::sort(scores.begin(), scores.end(), std::greater<double>());
  std::vector<double> thresholds;
  double current_recall = 0;
  for (size_t i = 0; i < scores.size(); ++i) {
    const double left = (i + 1) / n_gt;
    const double right =
        (i < scores.size() - 1) ? (i + 2) / n_gt : left;
    if ((right - current_recall) < (current_recall - left) &&
        i < scores.size() - 1)
      continue;
    thresholds.push_back(scores[i]);
    current_recall += 1.0 / (kNumSamplePts - 1.0);
  }
  return thresholds;
}

struct CurvePair {
  std::vector<double> precision;  // kNumSamplePts values
  std::vector<double> aos;        // empty if not computed
};

CurvePair EvalClassDifficulty(int cls, int difficulty,
                              const std::vector<std::vector<GtObject>>& gts,
                              const std::vector<std::vector<Detection>>& dets,
                              bool compute_aos) {
  const int n = static_cast<int>(gts.size());
  int n_gt = 0;
  std::vector<std::vector<int>> gt_flags(n), det_flags(n);
  std::vector<std::vector<Box>> dontcare(n);
  std::vector<double> tp_scores;

  for (int i = 0; i < n; ++i) {
    CleanFrame(cls, difficulty, gts[i], dets[i], &gt_flags[i], &det_flags[i],
               &dontcare[i], &n_gt);
    FrameStats pre = MatchFrame(cls, gts[i], dets[i], dontcare[i],
                                gt_flags[i], det_flags[i],
                                /*count_fp=*/false, false, 0);
    tp_scores.insert(tp_scores.end(), pre.tp_scores.begin(),
                     pre.tp_scores.end());
  }

  std::vector<double> thresholds = RecallThresholds(tp_scores, n_gt);

  std::vector<int> tp(thresholds.size(), 0), fp(thresholds.size(), 0),
      fn(thresholds.size(), 0);
  std::vector<double> sim(thresholds.size(), 0);
  for (int i = 0; i < n; ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      FrameStats s = MatchFrame(cls, gts[i], dets[i], dontcare[i],
                                gt_flags[i], det_flags[i],
                                /*count_fp=*/true, compute_aos,
                                thresholds[t]);
      tp[t] += s.tp;
      fp[t] += s.fp;
      fn[t] += s.fn;
      if (s.similarity != -1) sim[t] += s.similarity;
    }
  }

  CurvePair out;
  out.precision.assign(kNumSamplePts, 0.0);
  if (compute_aos) out.aos.assign(kNumSamplePts, 0.0);
  for (size_t t = 0; t < thresholds.size(); ++t) {
    // tp+fp can be 0 when every above-threshold det was absorbed by
    // ignored GT / DontCare; 0/0 would poison the right-max below
    const double denom = static_cast<double>(tp[t] + fp[t]);
    out.precision[t] = denom > 0 ? tp[t] / denom : 0.0;
    if (compute_aos) out.aos[t] = denom > 0 ? sim[t] / denom : 0.0;
  }
  // monotonicise from the right over the full 41-sample vector
  for (size_t t = 0; t < thresholds.size(); ++t) {
    out.precision[t] = *std::max_element(out.precision.begin() + t,
                                         out.precision.end());
    if (compute_aos)
      out.aos[t] = *std::max_element(out.aos.begin() + t, out.aos.end());
  }
  return out;
}

// 11-point AP over every 4th of the 41 samples; append curves to files.
void WriteStats(const CurvePair& curve, FILE* fp_det, FILE* fp_ap,
                FILE* fp_ori) {
  double ap = 0;
  int count = 0;
  for (int i = 0; i < kNumSamplePts; i += 4) {
    ap += curve.precision[i];
    ++count;
    fprintf(fp_det, "%f ", curve.precision[i]);
  }
  fprintf(fp_det, "\n");
  assert(count == 11);
  std::ostringstream ap_text;
  ap_text << ap / count;  // default 6-significant-digit formatting
  fprintf(fp_ap, "AP=%s\n", ap_text.str().c_str());

  if (fp_ori && !curve.aos.empty()) {
    for (int i = 0; i < kNumSamplePts; ++i)
      fprintf(fp_ori, "%f ", curve.aos[i]);
    fprintf(fp_ori, "\n");
  }
}

void WriteCurveData(const std::string& plot_dir, const std::string& name,
                    const CurvePair curves[kNumDifficulties], bool aos) {
  std::ofstream out(plot_dir + "/" + name + ".txt");
  for (int i = 0; i < kNumSamplePts; ++i) {
    out << static_cast<double>(i) / (kNumSamplePts - 1.0);
    for (int d = 0; d < kNumDifficulties; ++d)
      out << " " << (aos ? curves[d].aos[i] : curves[d].precision[i]);
    out << "\n";
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 5) {
    std::cerr << "usage: " << argv[0]
              << " <gt_training_dir> <image_set_file> <result_dir> <N>\n";
    return 1;
  }
  const std::string gt_dir = std::string(argv[1]) + "/label_2";
  const std::string image_set_file = argv[2];
  const std::string result_dir = argv[3];
  const int n_images = std::atoi(argv[4]);

  std::ifstream ids_in(image_set_file);
  if (!ids_in) {
    std::cerr << "cannot read image set file " << image_set_file << "\n";
    return 1;
  }
  std::vector<std::string> ids;
  for (std::string id; ids_in >> id;) ids.push_back(id);
  if (static_cast<int>(ids.size()) != n_images) {
    std::cerr << "image set has " << ids.size() << " ids, expected "
              << n_images << "\n";
    return 1;
  }

  std::vector<std::vector<GtObject>> gts;
  std::vector<std::vector<Detection>> dets;
  bool compute_aos = true;
  bool class_seen[kNumClasses] = {false, false, false};
  for (const auto& id : ids) {
    bool gt_ok = false, det_ok = false;
    gts.push_back(LoadGroundtruth(gt_dir + "/" + id + ".txt", &gt_ok));
    dets.push_back(LoadDetections(result_dir + "/data/" + id + ".txt",
                                  &det_ok, &compute_aos, class_seen));
    if (!gt_ok || !det_ok) {
      std::cerr << "cannot read gt/detections for frame " << id << "\n";
      return 1;
    }
  }

  const std::string plot_dir = result_dir + "/plot";
  mkdir(plot_dir.c_str(), 0755);

  for (int cls = 0; cls < kNumClasses; ++cls) {
    const std::string name = kClassNames[cls];
    if (!class_seen[cls]) {
      // a previous eval into the same result_dir may have written stats
      // for this class; a stale file would be parsed as THIS run's AP
      remove((result_dir + "/stats_" + name + "_detection.txt").c_str());
      remove((result_dir + "/stats_" + name + "_ap.txt").c_str());
      remove((result_dir + "/stats_" + name + "_orientation.txt").c_str());
      continue;
    }

    FILE* fp_det =
        fopen((result_dir + "/stats_" + name + "_detection.txt").c_str(), "w");
    FILE* fp_ap =
        fopen((result_dir + "/stats_" + name + "_ap.txt").c_str(), "w");
    FILE* fp_ori =
        compute_aos
            ? fopen((result_dir + "/stats_" + name + "_orientation.txt").c_str(),
                    "w")
            : nullptr;
    if (!fp_det || !fp_ap || (compute_aos && !fp_ori)) {
      std::cerr << "cannot open stats files for writing in " << result_dir
                << "\n";
      return 1;
    }

    CurvePair curves[kNumDifficulties];
    for (int d = 0; d < kNumDifficulties; ++d) {
      curves[d] = EvalClassDifficulty(cls, d, gts, dets, compute_aos);
      WriteStats(curves[d], fp_det, fp_ap, fp_ori);
    }
    WriteCurveData(plot_dir, name + "_detection", curves, false);
    if (compute_aos) WriteCurveData(plot_dir, name + "_orientation", curves, true);

    fclose(fp_det);
    fclose(fp_ap);
    if (fp_ori) fclose(fp_ori);
  }
  std::cout << "evaluation complete; results in " << result_dir << "\n";
  return 0;
}
