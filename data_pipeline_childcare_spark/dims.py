"""Dimension tables — small, broadcast-joined.

The reference hard-codes these as Python dicts; here they are tiny
DataFrames the planner broadcasts (SURVEY.md §1.1):
  - China administrative gazetteer province→cities (retrieve.py:1027-1062)
  - education-level normalization map (retrieve.py:1000-1023)
The full gazetteer is public administrative data; we carry a
representative subset covering every structural case the rule engine
branches on (direct-managed cities, the 吉林 province/city ambiguity,
multi-city provinces) — extending to all ~340 cities is data entry,
not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# province -> cities (subset; structure mirrors the reference's CHINA_REGIONS)
CHINA_REGIONS: dict[str, list[str]] = {
    "北京": ["北京"],
    "上海": ["上海"],
    "天津": ["天津"],
    "重庆": ["重庆"],
    "四川": ["成都", "绵阳", "德阳", "宜宾", "南充", "乐山", "泸州"],
    "广东": ["广州", "深圳", "珠海", "佛山", "东莞", "中山", "惠州", "汕头"],
    "江苏": ["南京", "苏州", "无锡", "常州", "南通", "徐州", "扬州"],
    "浙江": ["杭州", "宁波", "温州", "嘉兴", "绍兴", "金华", "台州"],
    "山东": ["济南", "青岛", "烟台", "潍坊", "临沂", "淄博"],
    "吉林": ["长春", "吉林", "四平", "通化", "延边"],  # 吉林 is both province and city
    "辽宁": ["沈阳", "大连", "鞍山", "抚顺"],
    "湖北": ["武汉", "宜昌", "襄阳", "黄冈"],
    "湖南": ["长沙", "株洲", "湘潭", "衡阳"],
    "河南": ["郑州", "洛阳", "开封", "南阳"],
    "河北": ["石家庄", "唐山", "保定", "邯郸"],
    "陕西": ["西安", "咸阳", "宝鸡", "渭南"],
    "福建": ["福州", "厦门", "泉州", "漳州"],
    "安徽": ["合肥", "芜湖", "蚌埠", "安庆"],
    "云南": ["昆明", "大理", "丽江", "曲靖"],
    "贵州": ["贵阳", "遵义", "安顺"],
    "广西": ["南宁", "桂林", "柳州"],
    "黑龙江": ["哈尔滨", "齐齐哈尔", "大庆"],
    "山西": ["太原", "大同", "临汾"],
    "甘肃": ["兰州", "天水", "酒泉"],
    "海南": ["海口", "三亚"],
    "江西": ["南昌", "九江", "赣州"],
    "内蒙古": ["呼和浩特", "包头", "鄂尔多斯"],
    "宁夏": ["银川", "吴忠"],
    "青海": ["西宁", "海东"],
    "新疆": ["乌鲁木齐", "喀什", "伊犁"],
    "西藏": ["拉萨", "日喀则"],
}

# raw form -> normalized canonical level (reference EDUCATION_MAP,
# retrieve.py:1000-1023)
EDUCATION_MAP: dict[str, str] = {
    "中职": "中等职业教育",
    "高中": "中等职业教育",
    "中专": "中等职业教育",
    "中等职业教育": "中等职业教育",
    "高职": "高等职业教育（专科）",
    "专科": "高等职业教育（专科）",
    "大专": "高等职业教育（专科）",
    "高职专科": "高等职业教育（专科）",
    "高等职业教育": "高等职业教育（专科）",
    "高等职业教育（专科）": "高等职业教育（专科）",
    "高职本科": "职业教育（本科）",
    "职业本科": "职业教育（本科）",
    "职业教育（本科）": "职业教育（本科）",
    "本科": "普通本科",
    "普通本科": "普通本科",
    "硕士": "研究生教育",
    "研究生": "研究生教育",
    "博士": "研究生教育",
}


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """(province, city) rows — broadcast side of region resolution."""
    rows = [(p, c) for p, cities in CHINA_REGIONS.items() for c in cities]
    return spark.createDataFrame(rows, "province string, city string")


def city_to_province() -> dict[str, str]:
    """Reverse index city→province (reference retrieve.py:1064-1072).
    NOTE: 吉林 city maps to 吉林 province, same as the reference's
    last-writer-wins dict build."""
    out: dict[str, str] = {}
    for prov, cities in CHINA_REGIONS.items():
        for c in cities:
            out[c] = prov
    return out


def education_map_df(spark: SparkSession) -> DataFrame:
    rows = list(EDUCATION_MAP.items())
    return spark.createDataFrame(rows, "raw string, normalized string")
