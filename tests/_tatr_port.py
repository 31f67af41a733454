"""Verbatim-structure port of the reference TATR postprocess/pipeline
flow (``/root/reference/latyas/tsr/models/tatr/pipeline.py`` +
``postprocess.py``) used ONLY as the differential-test control for
``latyas_ray.functions.tsr_assemble`` — the repo's standard mechanism
(ports live in tests/, never in the engine).

The reference pins ``fitz==0.0.1.dev2`` (the PyPI stub, not PyMuPDF), so
``Rect`` here replicates PyMuPDF's documented algebra, which the code was
written against: width/height clamp at 0, ``intersect`` is a plain
coordinate max/min, the empty rect is the identity of ``include_rect``.
"""

from collections import OrderedDict, defaultdict


class Rect:
    def __init__(self, *args):
        if len(args) == 0:
            c = (0.0, 0.0, 0.0, 0.0)
        elif len(args) == 1:
            c = tuple(args[0])
        else:
            c = args
        self.x0, self.y0, self.x1, self.y1 = (float(v) for v in c)

    def __getitem__(self, i):
        return (self.x0, self.y0, self.x1, self.y1)[i]

    def __iter__(self):
        return iter((self.x0, self.y0, self.x1, self.y1))

    def __len__(self):
        return 4

    @property
    def width(self):
        return max(0.0, self.x1 - self.x0)

    @property
    def height(self):
        return max(0.0, self.y1 - self.y0)

    def get_area(self):
        return self.width * self.height

    @property
    def is_empty(self):
        return self.x1 <= self.x0 or self.y1 <= self.y0

    def intersect(self, r):
        r = Rect(r)
        self.x0 = max(self.x0, r.x0)
        self.y0 = max(self.y0, r.y0)
        self.x1 = min(self.x1, r.x1)
        self.y1 = min(self.y1, r.y1)
        return self

    def include_rect(self, r):
        r = Rect(r)
        if r.is_empty:
            return self
        if self.is_empty:
            self.x0, self.y0, self.x1, self.y1 = r.x0, r.y0, r.x1, r.y1
        else:
            self.x0 = min(self.x0, r.x0)
            self.y0 = min(self.y0, r.y0)
            self.x1 = max(self.x1, r.x1)
            self.y1 = max(self.y1, r.y1)
        return self


structure_class_thresholds = {
    "table": 0.5,
    "table column": 0.5,
    "table row": 0.5,
    "table column header": 0.5,
    "table projected row header": 0.5,
    "table spanning cell": 0.5,
    "no object": 10,
}


def iob(bbox1, bbox2):
    intersection = Rect(bbox1).intersect(bbox2)
    bbox1_area = Rect(bbox1).get_area()
    if bbox1_area > 0:
        return intersection.get_area() / bbox1_area
    return 0


def apply_threshold(objects, threshold):
    return [obj for obj in objects if obj['score'] >= threshold]


def sort_objects_by_score(objects, reverse=True):
    sign = -1 if reverse else 1
    return sorted(objects, key=lambda k: sign * k['score'])


def sort_objects_left_to_right(objs):
    return sorted(objs, key=lambda k: k['bbox'][0] + k['bbox'][2])


def sort_objects_top_to_bottom(objs):
    return sorted(objs, key=lambda k: k['bbox'][1] + k['bbox'][3])


def slot_into_containers(container_objects, package_objects, overlap_threshold=0.5,
                         unique_assignment=True, forced_assignment=False):
    best_match_scores = []
    container_assignments = [[] for _ in container_objects]
    package_assignments = [[] for _ in package_objects]
    if len(container_objects) == 0 or len(package_objects) == 0:
        return container_assignments, package_assignments, best_match_scores

    for package_num, package in enumerate(package_objects):
        match_scores = []
        package_rect = Rect(package['bbox'])
        package_area = package_rect.get_area()
        for container_num, container in enumerate(container_objects):
            container_rect = Rect(container['bbox'])
            intersect_area = container_rect.intersect(package['bbox']).get_area()
            overlap_fraction = intersect_area / package_area
            match_scores.append({'container': container,
                                 'container_num': container_num,
                                 'score': overlap_fraction})
        sorted_match_scores = sort_objects_by_score(match_scores)
        best_match_score = sorted_match_scores[0]
        best_match_scores.append(best_match_score['score'])
        if forced_assignment or best_match_score['score'] >= overlap_threshold:
            container_assignments[best_match_score['container_num']].append(package_num)
            package_assignments[package_num].append(best_match_score['container_num'])
        if not unique_assignment:
            for match_score in sorted_match_scores[1:]:
                if match_score['score'] >= overlap_threshold:
                    container_assignments[match_score['container_num']].append(package_num)
                    package_assignments[package_num].append(match_score['container_num'])
                else:
                    break
    return container_assignments, package_assignments, best_match_scores


def nms(objects, match_criteria="object2_overlap", match_threshold=0.05,
        keep_higher=True):
    if len(objects) == 0:
        return []
    objects = sort_objects_by_score(objects, reverse=keep_higher)
    num_objects = len(objects)
    suppression = [False for _ in objects]
    for object2_num in range(1, num_objects):
        object2_rect = Rect(objects[object2_num]['bbox'])
        object2_area = object2_rect.get_area()
        for object1_num in range(object2_num):
            if not suppression[object1_num]:
                object1_rect = Rect(objects[object1_num]['bbox'])
                object1_area = object1_rect.get_area()
                intersect_area = object1_rect.intersect(object2_rect).get_area()
                try:
                    if match_criteria == "object1_overlap":
                        metric = intersect_area / object1_area
                    elif match_criteria == "object2_overlap":
                        metric = intersect_area / object2_area
                    elif match_criteria == "iou":
                        metric = intersect_area / (
                            object1_area + object2_area - intersect_area)
                    if metric >= match_threshold:
                        suppression[object2_num] = True
                        break
                except Exception:
                    pass
    return [obj for idx, obj in enumerate(objects) if not suppression[idx]]


def nms_by_containment(container_objects, package_objects, overlap_threshold=0.5):
    container_objects = sort_objects_by_score(container_objects)
    num_objects = len(container_objects)
    suppression = [False for _ in container_objects]
    packages_by_container, _, _ = slot_into_containers(
        container_objects, package_objects, overlap_threshold=overlap_threshold,
        unique_assignment=True, forced_assignment=False)
    for object2_num in range(1, num_objects):
        object2_packages = set(packages_by_container[object2_num])
        if len(object2_packages) == 0:
            suppression[object2_num] = True
        for object1_num in range(object2_num):
            if not suppression[object1_num]:
                object1_packages = set(packages_by_container[object1_num])
                if len(object2_packages.intersection(object1_packages)) > 0:
                    suppression[object2_num] = True
    return [obj for idx, obj in enumerate(container_objects)
            if not suppression[idx]]


def is_int(s):
    try:
        int(s)
        return True
    except ValueError:
        return False


def extract_text_from_spans(spans, join_with_space=True,
                            remove_integer_superscripts=True):
    join_char = " " if join_with_space else ""
    spans_copy = spans[:]
    if remove_integer_superscripts:
        for span in spans:
            if 'flags' not in span:
                continue
            flags = span['flags']
            if flags & 2 ** 0:
                if is_int(span['text']):
                    spans_copy.remove(span)
                else:
                    span['superscript'] = True
    if len(spans_copy) == 0:
        return ""
    spans_copy.sort(key=lambda span: span['span_num'])
    spans_copy.sort(key=lambda span: span['line_num'])
    spans_copy.sort(key=lambda span: span['block_num'])
    line_texts = []
    line_span_texts = [spans_copy[0]['text']]
    for span1, span2 in zip(spans_copy[:-1], spans_copy[1:]):
        if (not span1['block_num'] == span2['block_num']
                or not span1['line_num'] == span2['line_num']):
            line_text = join_char.join(line_span_texts).strip()
            if (len(line_text) > 0
                    and not line_text[-1] == ' '
                    and not (len(line_text) > 1 and line_text[-1] == "-"
                             and not line_text[-2] == ' ')):
                if not join_with_space:
                    line_text += ' '
            line_texts.append(line_text)
            line_span_texts = [span2['text']]
        else:
            line_span_texts.append(span2['text'])
    line_text = join_char.join(line_span_texts)
    line_texts.append(line_text)
    return join_char.join(line_texts).strip()


def overlaps(bbox1, bbox2, threshold=0.5):
    rect1 = Rect(list(bbox1))
    area1 = rect1.get_area()
    if area1 == 0:
        return False
    return rect1.intersect(list(bbox2)).get_area() / area1 >= threshold


def get_bbox_span_subset(spans, bbox, threshold=0.5):
    return [span for span in spans if overlaps(span['bbox'], bbox, threshold)]


def extract_text_inside_bbox(spans, bbox):
    bbox_spans = get_bbox_span_subset(spans, bbox)
    bbox_text = extract_text_from_spans(bbox_spans,
                                        remove_integer_superscripts=True)
    return bbox_text, bbox_spans


def remove_objects_without_content(page_spans, objects):
    for obj in objects[:]:
        object_text, _ = extract_text_inside_bbox(page_spans, obj['bbox'])
        if len(object_text.strip()) == 0:
            objects.remove(obj)


def refine_rows(rows, tokens, score_threshold):
    if len(tokens) > 0:
        rows = nms_by_containment(rows, tokens, overlap_threshold=0.5)
        remove_objects_without_content(tokens, rows)
    else:
        rows = nms(rows, match_criteria="object2_overlap",
                   match_threshold=0.5, keep_higher=True)
    if len(rows) > 1:
        rows = sort_objects_top_to_bottom(rows)
    return rows


def refine_columns(columns, tokens, score_threshold):
    if len(tokens) > 0:
        columns = nms_by_containment(columns, tokens, overlap_threshold=0.5)
        remove_objects_without_content(tokens, columns)
    else:
        columns = nms(columns, match_criteria="object2_overlap",
                      match_threshold=0.25, keep_higher=True)
    if len(columns) > 1:
        columns = sort_objects_left_to_right(columns)
    return columns


def align_columns(columns, bbox):
    for column in columns:
        column['bbox'][1] = bbox[1]
        column['bbox'][3] = bbox[3]
    return columns


def align_rows(rows, bbox):
    for row in rows:
        row['bbox'][0] = bbox[0]
        row['bbox'][2] = bbox[2]
    return rows


def align_headers(headers, rows):
    aligned_headers = []
    for row in rows:
        row['column header'] = False
    header_row_nums = []
    for header in headers:
        for row_num, row in enumerate(rows):
            row_height = row['bbox'][3] - row['bbox'][1]
            min_row_overlap = max(row['bbox'][1], header['bbox'][1])
            max_row_overlap = min(row['bbox'][3], header['bbox'][3])
            overlap_height = max_row_overlap - min_row_overlap
            if overlap_height / row_height >= 0.5:
                header_row_nums.append(row_num)
    if len(header_row_nums) == 0:
        return aligned_headers
    header_rect = Rect()
    if header_row_nums[0] > 0:
        header_row_nums = list(range(header_row_nums[0] + 1)) + header_row_nums
    last_row_num = -1
    for row_num in header_row_nums:
        if row_num == last_row_num + 1:
            row = rows[row_num]
            row['column header'] = True
            header_rect = header_rect.include_rect(row['bbox'])
            last_row_num = row_num
        else:
            break
    header = {'bbox': list(header_rect)}
    aligned_headers.append(header)
    return aligned_headers


def align_supercells(supercells, rows, columns):
    aligned_supercells = []
    for supercell in supercells:
        supercell['header'] = False
        row_bbox_rect = None
        col_bbox_rect = None
        intersecting_header_rows = set()
        intersecting_data_rows = set()
        for row_num, row in enumerate(rows):
            row_height = row['bbox'][3] - row['bbox'][1]
            supercell_height = supercell['bbox'][3] - supercell['bbox'][1]
            min_row_overlap = max(row['bbox'][1], supercell['bbox'][1])
            max_row_overlap = min(row['bbox'][3], supercell['bbox'][3])
            overlap_height = max_row_overlap - min_row_overlap
            if 'span' in supercell:
                overlap_fraction = max(overlap_height / row_height,
                                       overlap_height / supercell_height)
            else:
                overlap_fraction = overlap_height / row_height
            if overlap_fraction >= 0.5:
                if 'column header' in row and row['column header']:
                    intersecting_header_rows.add(row_num)
                else:
                    intersecting_data_rows.add(row_num)
        supercell['header'] = False
        if len(intersecting_data_rows) > 0 and len(intersecting_header_rows) > 0:
            if len(intersecting_data_rows) > len(intersecting_header_rows):
                intersecting_header_rows = set()
            else:
                intersecting_data_rows = set()
        if len(intersecting_header_rows) > 0:
            supercell['header'] = True
        elif 'span' in supercell:
            continue
        intersecting_rows = intersecting_data_rows.union(intersecting_header_rows)
        for row_num in intersecting_rows:
            if row_bbox_rect is None:
                row_bbox_rect = Rect(rows[row_num]['bbox'])
            else:
                row_bbox_rect = row_bbox_rect.include_rect(rows[row_num]['bbox'])
        if row_bbox_rect is None:
            continue
        intersecting_cols = []
        for col_num, col in enumerate(columns):
            col_width = col['bbox'][2] - col['bbox'][0]
            supercell_width = supercell['bbox'][2] - supercell['bbox'][0]
            min_col_overlap = max(col['bbox'][0], supercell['bbox'][0])
            max_col_overlap = min(col['bbox'][2], supercell['bbox'][2])
            overlap_width = max_col_overlap - min_col_overlap
            if 'span' in supercell:
                overlap_fraction = max(overlap_width / col_width,
                                       overlap_width / supercell_width)
                if supercell['header']:
                    overlap_fraction = overlap_fraction * 2
            else:
                overlap_fraction = overlap_width / col_width
            if overlap_fraction >= 0.5:
                intersecting_cols.append(col_num)
                if col_bbox_rect is None:
                    col_bbox_rect = Rect(col['bbox'])
                else:
                    col_bbox_rect = col_bbox_rect.include_rect(col['bbox'])
        if col_bbox_rect is None:
            continue
        supercell_bbox = list(row_bbox_rect.intersect(col_bbox_rect))
        supercell['bbox'] = supercell_bbox
        if (len(intersecting_rows) > 0 and len(intersecting_cols) > 0
                and (len(intersecting_rows) > 1 or len(intersecting_cols) > 1)):
            supercell['row_numbers'] = list(intersecting_rows)
            supercell['column_numbers'] = intersecting_cols
            aligned_supercells.append(supercell)
            if ('span' in supercell and supercell['header']
                    and len(supercell['column_numbers']) > 1):
                for row_num in range(0, min(supercell['row_numbers'])):
                    new_supercell = {'row_numbers': [row_num],
                                     'column_numbers': supercell['column_numbers'],
                                     'score': supercell['score'],
                                     'propagated': True}
                    new_supercell_columns = [columns[idx] for idx in
                                             supercell['column_numbers']]
                    new_supercell_rows = [rows[idx] for idx in
                                          supercell['row_numbers']]
                    bbox = [min([c['bbox'][0] for c in new_supercell_columns]),
                            min([r['bbox'][1] for r in new_supercell_rows]),
                            max([c['bbox'][2] for c in new_supercell_columns]),
                            max([r['bbox'][3] for r in new_supercell_rows])]
                    new_supercell['bbox'] = bbox
                    aligned_supercells.append(new_supercell)
    return aligned_supercells


def remove_supercell_overlap(supercell1, supercell2):
    common_rows = set(supercell1['row_numbers']).intersection(
        set(supercell2['row_numbers']))
    common_columns = set(supercell1['column_numbers']).intersection(
        set(supercell2['column_numbers']))
    while len(common_rows) > 0 and len(common_columns) > 0:
        if len(supercell2['row_numbers']) < len(supercell2['column_numbers']):
            min_column = min(supercell2['column_numbers'])
            max_column = max(supercell2['column_numbers'])
            if max_column in common_columns:
                common_columns.remove(max_column)
                supercell2['column_numbers'].remove(max_column)
            elif min_column in common_columns:
                common_columns.remove(min_column)
                supercell2['column_numbers'].remove(min_column)
            else:
                supercell2['column_numbers'] = []
                common_columns = set()
        else:
            min_row = min(supercell2['row_numbers'])
            max_row = max(supercell2['row_numbers'])
            if max_row in common_rows:
                common_rows.remove(max_row)
                supercell2['row_numbers'].remove(max_row)
            elif min_row in common_rows:
                common_rows.remove(min_row)
                supercell2['row_numbers'].remove(min_row)
            else:
                supercell2['row_numbers'] = []
                common_rows = set()


def nms_supercells(supercells):
    supercells = sort_objects_by_score(supercells)
    num_supercells = len(supercells)
    suppression = [False for _ in supercells]
    for supercell2_num in range(1, num_supercells):
        supercell2 = supercells[supercell2_num]
        for supercell1_num in range(supercell2_num):
            supercell1 = supercells[supercell1_num]
            remove_supercell_overlap(supercell1, supercell2)
        if ((len(supercell2['row_numbers']) < 2
             and len(supercell2['column_numbers']) < 2)
                or len(supercell2['row_numbers']) == 0
                or len(supercell2['column_numbers']) == 0):
            suppression[supercell2_num] = True
    return [obj for idx, obj in enumerate(supercells) if not suppression[idx]]


def header_supercell_tree(supercells):
    header_supercells = [sc for sc in supercells
                         if 'header' in sc and sc['header']]
    header_supercells = sort_objects_by_score(header_supercells)
    for header_supercell in header_supercells[:]:
        ancestors_by_row = defaultdict(int)
        min_row = min(header_supercell['row_numbers'])
        for header_supercell2 in header_supercells:
            max_row2 = max(header_supercell2['row_numbers'])
            if max_row2 < min_row:
                if set(header_supercell['column_numbers']).issubset(
                        set(header_supercell2['column_numbers'])):
                    for row2 in header_supercell2['row_numbers']:
                        ancestors_by_row[row2] += 1
        for row in range(0, min_row):
            if not ancestors_by_row[row] == 1:
                supercells.remove(header_supercell)
                break


def refine_table_structure(table_structure, class_thresholds):
    rows = table_structure["rows"]
    columns = table_structure['columns']
    column_headers = table_structure['column headers']
    column_headers = apply_threshold(column_headers,
                                     class_thresholds["table column header"])
    column_headers = nms(column_headers)
    column_headers = align_headers(column_headers, rows)

    spanning_cells = [elem for elem in table_structure['spanning cells']
                      if not elem['projected row header']]
    projected_row_headers = [elem for elem in table_structure['spanning cells']
                             if elem['projected row header']]
    spanning_cells = apply_threshold(spanning_cells,
                                     class_thresholds["table spanning cell"])
    projected_row_headers = apply_threshold(
        projected_row_headers, class_thresholds["table projected row header"])
    spanning_cells += projected_row_headers
    spanning_cells = align_supercells(spanning_cells, rows, columns)
    spanning_cells = nms_supercells(spanning_cells)
    header_supercell_tree(spanning_cells)

    table_structure['columns'] = columns
    table_structure['rows'] = rows
    table_structure['spanning cells'] = spanning_cells
    table_structure['column headers'] = column_headers
    return table_structure


def objects_to_structures(objects, tokens, class_thresholds):
    tables = [obj for obj in objects if obj['label'] == 'table']
    table_structures = []
    for table in tables:
        table_objects = [obj for obj in objects
                         if iob(obj['bbox'], table['bbox']) >= 0.5]
        table_tokens = [token for token in tokens
                        if iob(token['bbox'], table['bbox']) >= 0.5]
        structure = {}
        columns = [obj for obj in table_objects if obj['label'] == 'table column']
        rows = [obj for obj in table_objects if obj['label'] == 'table row']
        column_headers = [obj for obj in table_objects
                          if obj['label'] == 'table column header']
        spanning_cells = [obj for obj in table_objects
                          if obj['label'] == 'table spanning cell']
        for obj in spanning_cells:
            obj['projected row header'] = False
        projected_row_headers = [obj for obj in table_objects
                                 if obj['label'] == 'table projected row header']
        for obj in projected_row_headers:
            obj['projected row header'] = True
        spanning_cells += projected_row_headers
        for obj in rows:
            obj['column header'] = False
            for header_obj in column_headers:
                if iob(obj['bbox'], header_obj['bbox']) >= 0.5:
                    obj['column header'] = True
        rows = refine_rows(rows, table_tokens, class_thresholds['table row'])
        columns = refine_columns(columns, table_tokens,
                                 class_thresholds['table column'])
        row_rect = Rect()
        for obj in rows:
            row_rect.include_rect(obj['bbox'])
        column_rect = Rect()
        for obj in columns:
            column_rect.include_rect(obj['bbox'])
        table['row_column_bbox'] = [column_rect[0], row_rect[1],
                                    column_rect[2], row_rect[3]]
        table['bbox'] = table['row_column_bbox']
        columns = align_columns(columns, table['row_column_bbox'])
        rows = align_rows(rows, table['row_column_bbox'])
        structure['rows'] = rows
        structure['columns'] = columns
        structure['column headers'] = column_headers
        structure['spanning cells'] = spanning_cells
        if len(rows) > 0 and len(columns) > 1:
            structure = refine_table_structure(structure, class_thresholds)
        table_structures.append(structure)
    return table_structures


def structure_to_cells(table_structure, tokens):
    columns = table_structure['columns']
    rows = table_structure['rows']
    spanning_cells = table_structure['spanning cells']
    cells = []
    subcells = []
    for column_num, column in enumerate(columns):
        for row_num, row in enumerate(rows):
            column_rect = Rect(list(column['bbox']))
            row_rect = Rect(list(row['bbox']))
            cell_rect = row_rect.intersect(column_rect)
            header = 'column header' in row and row['column header']
            cell = {'bbox': list(cell_rect), 'column_nums': [column_num],
                    'row_nums': [row_num], 'column header': header}
            cell['subcell'] = False
            for spanning_cell in spanning_cells:
                spanning_cell_rect = Rect(list(spanning_cell['bbox']))
                if (spanning_cell_rect.intersect(cell_rect).get_area()
                        / cell_rect.get_area()) > 0.5:
                    cell['subcell'] = True
                    break
            if cell['subcell']:
                subcells.append(cell)
            else:
                cell['projected row header'] = False
                cells.append(cell)

    for spanning_cell in spanning_cells:
        spanning_cell_rect = Rect(list(spanning_cell['bbox']))
        cell_columns = set()
        cell_rows = set()
        cell_rect = None
        header = True
        for subcell in subcells:
            subcell_rect = Rect(list(subcell['bbox']))
            subcell_rect_area = subcell_rect.get_area()
            if (subcell_rect.intersect(spanning_cell_rect).get_area()
                    / subcell_rect_area) > 0.5:
                if cell_rect is None:
                    cell_rect = Rect(list(subcell['bbox']))
                else:
                    cell_rect.include_rect(Rect(list(subcell['bbox'])))
                cell_rows = cell_rows.union(set(subcell['row_nums']))
                cell_columns = cell_columns.union(set(subcell['column_nums']))
                header = header and 'column header' in subcell and subcell['column header']
        if len(cell_rows) > 0 and len(cell_columns) > 0:
            cell = {'bbox': list(cell_rect), 'column_nums': list(cell_columns),
                    'row_nums': list(cell_rows), 'column header': header,
                    'projected row header': spanning_cell['projected row header']}
            cells.append(cell)

    _, _, cell_match_scores = slot_into_containers(cells, tokens)
    try:
        mean_match_score = sum(cell_match_scores) / len(cell_match_scores)
        min_match_score = min(cell_match_scores)
        confidence_score = (mean_match_score + min_match_score) / 2
    except Exception:
        confidence_score = 0

    dilated_columns = columns
    dilated_rows = rows
    for cell in cells:
        column_rect = Rect()
        for column_num in cell['column_nums']:
            column_rect.include_rect(list(dilated_columns[column_num]['bbox']))
        row_rect = Rect()
        for row_num in cell['row_nums']:
            row_rect.include_rect(list(dilated_rows[row_num]['bbox']))
        cell_rect = column_rect.intersect(row_rect)
        cell['bbox'] = list(cell_rect)

    span_nums_by_cell, _, _ = slot_into_containers(
        cells, tokens, overlap_threshold=0.001,
        unique_assignment=True, forced_assignment=False)
    for cell, cell_span_nums in zip(cells, span_nums_by_cell):
        cell_spans = [tokens[num] for num in cell_span_nums]
        cell['cell text'] = extract_text_from_spans(
            cell_spans, remove_integer_superscripts=False)
        cell['spans'] = cell_spans

    num_rows = len(rows)
    rows = sort_objects_top_to_bottom(rows)
    num_columns = len(columns)
    columns = sort_objects_left_to_right(columns)
    min_y_values_by_row = defaultdict(list)
    max_y_values_by_row = defaultdict(list)
    min_x_values_by_column = defaultdict(list)
    max_x_values_by_column = defaultdict(list)
    for cell in cells:
        min_row = min(cell["row_nums"])
        max_row = max(cell["row_nums"])
        min_column = min(cell["column_nums"])
        max_column = max(cell["column_nums"])
        for span in cell['spans']:
            min_x_values_by_column[min_column].append(span['bbox'][0])
            min_y_values_by_row[min_row].append(span['bbox'][1])
            max_x_values_by_column[max_column].append(span['bbox'][2])
            max_y_values_by_row[max_row].append(span['bbox'][3])
    for row_num, row in enumerate(rows):
        if len(min_x_values_by_column[0]) > 0:
            row['bbox'][0] = min(min_x_values_by_column[0])
        if len(min_y_values_by_row[row_num]) > 0:
            row['bbox'][1] = min(min_y_values_by_row[row_num])
        if len(max_x_values_by_column[num_columns - 1]) > 0:
            row['bbox'][2] = max(max_x_values_by_column[num_columns - 1])
        if len(max_y_values_by_row[row_num]) > 0:
            row['bbox'][3] = max(max_y_values_by_row[row_num])
    for column_num, column in enumerate(columns):
        if len(min_x_values_by_column[column_num]) > 0:
            column['bbox'][0] = min(min_x_values_by_column[column_num])
        if len(min_y_values_by_row[0]) > 0:
            column['bbox'][1] = min(min_y_values_by_row[0])
        if len(max_x_values_by_column[column_num]) > 0:
            column['bbox'][2] = max(max_x_values_by_column[column_num])
        if len(max_y_values_by_row[num_rows - 1]) > 0:
            column['bbox'][3] = max(max_y_values_by_row[num_rows - 1])
    for cell in cells:
        row_rect = Rect()
        column_rect = Rect()
        for row_num in cell['row_nums']:
            row_rect.include_rect(list(rows[row_num]['bbox']))
        for column_num in cell['column_nums']:
            column_rect.include_rect(list(columns[column_num]['bbox']))
        cell_rect = row_rect.intersect(column_rect)
        if cell_rect.get_area() > 0:
            cell['bbox'] = list(cell_rect)
    return cells, confidence_score
